"""Training-shard export (operators/shards.py): uint16 blob layout,
manifest integrity checksums, the crash-safe one-rename publish, and
URL canonicalization (functions/urls.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.functions.urls import canonicalize_url
from shopify_etl_spark.operators import shards as S


@pytest.fixture()
def docs(spark):
    # 6 docs over 2 sources; token "common" dominates the vocab ranking
    rows = [
        (0, "a", "common common alpha beta"),
        (1, "a", "common gamma  delta epsilon zeta"),
        (2, "a", "common alpha"),
        (3, "b", "common beta beta"),
        (4, "b", ""),  # empty doc: packs nothing, emits nothing
        (5, "b", "zeta common"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _expected_ids(docs_rows, vocab_size):
    """Reference (pure-Python) id assignment: rank by (tf desc, token)."""
    from collections import Counter

    toks = {
        (d, s): t.split() for d, s, t in docs_rows if t.split()
    }
    tf = Counter(w for ws in toks.values() for w in ws)
    ranked = sorted(tf, key=lambda w: (-tf[w], w))[:vocab_size]
    tid = {w: i for i, w in enumerate(ranked)}
    streams = {}
    for (d, s), ws in sorted(toks.items()):
        streams.setdefault(s, []).extend(
            tid.get(w, vocab_size) for w in ws
        )
    return streams


class TestShardLayout:
    def test_blob_bytes_and_manifest(self, spark, docs):
        seq_len, sps, v = 4, 2, 8  # shard span = 8 positions
        stream = S.shard_token_stream(
            docs, vocab_size=v, seq_len=seq_len, seqs_per_shard=sps
        )
        blobs = {
            (r["source"], r["shard_id"]): r
            for r in S.shard_blobs(
                stream, vocab_size=v, seq_len=seq_len
            ).collect()
        }
        exp = _expected_ids(
            [(r.doc_id, r.source, r.text) for r in docs.collect()], v
        )
        for src, ids in exp.items():
            span = seq_len * sps
            for sh in range(-(-len(ids) // span)):
                row = blobs[(src, sh)]
                chunk = ids[sh * span:(sh + 1) * span]
                n_seqs = -(-len(chunk) // seq_len)
                padded = chunk + [v + 1] * (n_seqs * seq_len - len(chunk))
                got = np.frombuffer(bytes(row["blob"]), dtype="<u2")
                assert got.tolist() == padded
                assert row["n_seqs"] == n_seqs
                assert row["n_tokens"] == len(chunk)
                assert row["n_pad"] == len(padded) - len(chunk)
                assert row["byte_len"] == 2 * len(padded)
                want_ck = sum(
                    (t + 1) * (q + 1) for q, t in enumerate(padded)
                )
                assert row["checksum"] == want_ck
        # every (source, shard) accounted for — no extras
        assert len(blobs) == sum(
            -(-len(ids) // (seq_len * sps)) for ids in exp.values()
        )

    def test_vocab_overflow_rejected(self, spark, docs):
        stream = S.shard_token_stream(docs, vocab_size=8)
        with pytest.raises(ValueError, match="uint16"):
            S.shard_blobs(stream, vocab_size=70000)

    def test_deterministic_across_runs(self, spark, docs):
        def manifest():
            return sorted(
                S.shard_manifest(
                    S.shard_blobs(
                        S.shard_token_stream(
                            docs, vocab_size=8, seq_len=4,
                            seqs_per_shard=2,
                        ),
                        vocab_size=8, seq_len=4,
                    )
                ).collect()
            )

        assert manifest() == manifest()


class TestShardPublish:
    def test_export_read_roundtrip(self, spark, docs, tmp_path):
        root = str(tmp_path / "shards")
        v = S.export_training_shards(
            spark, docs, root, vocab_size=8, seq_len=4, seqs_per_shard=2
        )
        assert v == 1
        manifest, blobs = S.read_training_shards(spark, root)
        assert manifest.count() == blobs.count() > 0
        # second export commits v2 and becomes the read target
        v2 = S.export_training_shards(
            spark, docs, root, vocab_size=8, seq_len=4, seqs_per_shard=2
        )
        assert v2 == 2
        m2, _ = S.read_training_shards(spark, root)
        assert sorted(m2.collect()) == sorted(manifest.collect())

    def test_crashed_stage_is_invisible(self, spark, docs, tmp_path):
        root = str(tmp_path / "shards")
        S.export_training_shards(
            spark, docs, root, vocab_size=8, seq_len=4, seqs_per_shard=2
        )
        # simulate a crash mid-export: staging dir written, rename never
        # happened — readers must keep resolving v1
        stage = tmp_path / "shards" / "_stage.v2"
        (stage / "blobs").mkdir(parents=True)
        (stage / "blobs" / "part-00000.parquet").write_bytes(b"torn")
        manifest, _ = S.read_training_shards(spark, root)
        assert manifest.count() > 0  # v1 still serves

    def test_validation_catches_manifest_blob_mismatch(
        self, spark, docs, tmp_path
    ):
        root = str(tmp_path / "shards")
        S.export_training_shards(
            spark, docs, root, vocab_size=8, seq_len=4, seqs_per_shard=2
        )
        bad = spark.read.parquet(f"{root}/v1/manifest").withColumn(
            "checksum", F.col("checksum") + 1
        )
        bad.cache().count()  # read fully before overwriting the source
        bad.write.mode("overwrite").parquet(f"{root}/v1/manifest")
        with pytest.raises(ValueError, match="checksum"):
            S.read_training_shards(spark, root)
        m, _ = S.read_training_shards(spark, root, validate=False)
        assert m.count() > 0

    def test_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            S.read_training_shards(spark, str(tmp_path / "nope"))


class TestCanonicalizeUrl:
    @pytest.mark.parametrize(
        "raw,want",
        [
            ("http://a.example/x", "http://a.example/x"),
            ("HTTP://A.EXAMPLE/x", "http://a.example/x"),
            ("http://a.example:80/x", "http://a.example/x"),
            ("https://a.example:443/x", "https://a.example/x"),
            ("http://a.example:8080/x", "http://a.example:8080/x"),
            ("https://a.example:80/x", "https://a.example:80/x"),
            ("http://a.example//x///y//", "http://a.example/x/y"),
            ("http://a.example/x/#frag", "http://a.example/x"),
            ("http://a.example", "http://a.example/"),
            ("http://a.example/", "http://a.example/"),
            (
                "http://a.example/x?b=2&a=1#f",
                "http://a.example/x?b=2&a=1",  # query kept verbatim
            ),
            (
                "HTTP://HOST3.EXAMPLE:80//sec5//doc/44/#frag",
                "http://host3.example/sec5/doc/44",
            ),
        ],
    )
    def test_rules(self, spark, raw, want):
        got = (
            spark.range(1)
            .select(canonicalize_url(F.lit(raw)))
            .collect()[0][0]
        )
        assert got == want

    def test_null_and_garbage(self, spark):
        df = spark.createDataFrame(
            [(None,), ("not a url",)], "u string"
        )
        got = [r[0] for r in df.select(canonicalize_url("u")).collect()]
        assert got[0] is None
        # unparseable: parse_url yields null parts -> null key (drops
        # out of URL-keyed joins instead of grouping under garbage)
        assert got[1] is None


class TestBpeShardParity:
    """Round-16 byte-level differential for the SUBWORD shard export:
    an independent pure-Python replay of the whole chain (pretokenize →
    BPE train → greedy apply → ranked subword vocab → positions →
    shards → uint16 LE pack) must reproduce the Spark chain's blobs
    BYTE-FOR-BYTE — the codec-differential discipline applied to the
    non-SQL-replayable half of training_shard_export_bpe."""

    def _ref_blobs(self, rows, n_merges, vocab_size, seq_len, sps):
        import re
        from collections import Counter

        from shopify_etl_spark.operators.text import BPE_PRETOKEN_PATTERN

        pat = re.compile(BPE_PRETOKEN_PATTERN)
        # --- train (frequency dict fold; ties: count desc, pair asc)
        wc = Counter(w for _, _, t in rows for w in pat.findall(t))
        vocab = {tuple(w): n for w, n in wc.items()}
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for word, n in vocab.items():
                for pair in zip(word, word[1:]):
                    pc[pair] += n
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            nv = Counter()
            for word, n in vocab.items():
                out, i = [], 0
                while i < len(word):
                    if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                        out.append(word[i] + word[i + 1])
                        i += 2
                    else:
                        out.append(word[i])
                        i += 1
                nv[tuple(out)] += n
            vocab = nv
        # --- apply (lowest-rank-first, leftmost on rank ties)
        ranks = {p: i for i, p in enumerate(merges)}
        def enc(w):
            syms = list(w)
            while len(syms) > 1:
                cands = [
                    (ranks[(a, b)], i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks
                ]
                if not cands:
                    break
                _, i = min(cands)
                syms[i:i + 2] = [syms[i] + syms[i + 1]]
            return syms
        doc_toks = {}
        for d, s, t in rows:
            out = []
            for w in pat.findall(t):
                out.extend(enc(w))
            if out:
                doc_toks[(d, s)] = out
        # --- ranked subword vocab (tf desc, token asc), OOV/pad ids
        tf = Counter(tok for ts in doc_toks.values() for tok in ts)
        ranked = sorted(tf, key=lambda w: (-tf[w], w))[:vocab_size]
        tid = {w: i for i, w in enumerate(ranked)}
        streams = {}
        for (d, s), ts in sorted(doc_toks.items()):
            streams.setdefault(s, []).extend(
                tid.get(w, vocab_size) for w in ts
            )
        # --- shard + pack
        span = seq_len * sps
        blobs = {}
        for s, ids in streams.items():
            for sh in range(0, (len(ids) + span - 1) // span):
                chunk = ids[sh * span:(sh + 1) * span]
                n_seqs = -(-len(chunk) // seq_len)
                chunk = chunk + [vocab_size + 1] * (
                    n_seqs * seq_len - len(chunk)
                )
                blobs[(s, sh)] = np.array(
                    chunk, dtype="<u2"
                ).tobytes()
        return blobs

    def test_spark_chain_matches_reference_bytes(self, spark):
        from shopify_etl_spark.operators import text as T

        rows = [
            (0, "a", "the cat sat on the mat, the cat!"),
            (1, "a", "a catapult category 42 cats (category b)"),
            (2, "b", "the mat the cat the catapult 4242"),
            (3, "b", "don't categorize the cat's mat"),
            (4, "a", ""),
            (5, "b", "mat mat mat the the cat cat izer"),
        ]
        n_merges, v, seq_len, sps = 12, 16, 4, 2
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        merges = T.bpe_train(docs, n_merges=n_merges)
        seg = T.bpe_apply(docs, merges, keep_cols=("source",))
        stream = S.shard_token_stream(
            seg, vocab_size=v, seq_len=seq_len, seqs_per_shard=sps,
            tokens_col="bpe_tokens",
        )
        got = {
            (r["source"], r["shard_id"]): bytes(r["blob"])
            for r in S.shard_blobs(
                stream, vocab_size=v, seq_len=seq_len
            ).collect()
        }
        want = self._ref_blobs(rows, n_merges, v, seq_len, sps)
        assert got == want
        # the checksums certify the same bytes (one formula, both ends)
        for key, blob in want.items():
            assert S.blob_checksum(blob) == S.blob_checksum(got[key])

    def test_bpe_apply_keep_cols_ride_through(self, spark):
        docs = spark.createDataFrame(
            [(1, "x", "ab ab"), (2, "y", "cd")],
            "doc_id long, source string, text string",
        )
        out = {r.doc_id: r for r in T_apply(docs).collect()}
        assert out[1].source == "x" and out[2].source == "y"


def T_apply(docs):
    from shopify_etl_spark.operators import text as T

    return T.bpe_apply(docs, [("a", "b")], keep_cols=("source",))
