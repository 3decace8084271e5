"""Shard packing tests: budget rollover, straddle rule, group isolation."""

from shopify_etl_spark.operators import packing


def test_pack_shards_hand_computed(spark):
    # source A: docs of 4, 3, 5, 2 tokens; budget 6.
    # cum_before: 0, 4, 7, 12 -> shards 0, 0, 1, 2
    df = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (2, "a b c", "A"),
            (3, "a b c d e", "A"),
            (4, "a b", "A"),
            (10, "x y z w v u t", "B"),  # other group restarts at shard 0
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        r.doc_id: (r.shard_id, r.n_tokens)
        for r in packing.pack_shards(df, budget=6).collect()
    }
    assert got == {1: (0, 4), 2: (0, 3), 3: (1, 5), 4: (2, 2), 10: (0, 7)}


def test_pack_shards_deterministic(spark, sf_dir):
    from shopify_etl_spark.plans.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, packing.pack_shards(docs, budget=1000).collect()))
    b = sorted(map(tuple, packing.pack_shards(docs, budget=1000).collect()))
    assert a == b


def test_pack_sequences_hand_example(spark):
    """Tokens concatenate per source in doc_id order and cut every 5:
    doc 1 (4 tok) fills [0,4) of seq 0; doc 2 (3 tok) takes [4,5) of
    seq 0 then [0,2) of seq 1 — the straddle carries doc_offset 1."""
    df = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (2, "e f g", "A"),
            (3, "", "A"),            # empty doc packs nothing
            (10, "x y z w v u", "B"),  # other group restarts at seq 0
        ],
        ["doc_id", "text", "source"],
    )
    rows = {
        (r.source, r.seq_id, r.doc_id): (r.seq_start, r.doc_offset, r.chunk_len)
        for r in packing.pack_sequences(df, seq_len=5).collect()
    }
    assert rows == {
        ("A", 0, 1): (0, 0, 4),
        ("A", 0, 2): (4, 0, 1),
        ("A", 1, 2): (0, 1, 2),
        ("B", 0, 10): (0, 0, 5),
        ("B", 1, 10): (0, 5, 1),
    }


def test_pack_sequences_invariants(spark, sf_dir):
    """Chunks of one doc partition its tokens exactly; every sequence
    except each group's last is filled to exactly seq_len."""
    from pyspark.sql import functions as F

    from shopify_etl_spark.plans.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    spans = packing.pack_sequences(docs, seq_len=64).cache()
    try:
        # per-doc: chunk offsets/lengths partition [0, n_tokens)
        per_doc = (
            spans.groupBy("source", "doc_id")
            .agg(
                F.sum("chunk_len").alias("total"),
                F.min("doc_offset").alias("first_off"),
            )
        )
        shards = packing.pack_shards(docs, budget=10**9)  # just n_tokens
        joined = per_doc.join(
            shards.select("doc_id", "n_tokens"), "doc_id"
        )
        assert joined.filter("total <> n_tokens OR first_off <> 0").count() == 0
        # per-sequence fill: seq_len everywhere but each group's last seq
        fills = (
            spans.groupBy("source", "seq_id")
            .agg(F.sum("chunk_len").alias("fill"))
        )
        last = fills.groupBy("source").agg(F.max("seq_id").alias("last_seq"))
        not_last = fills.join(last, "source").filter("seq_id < last_seq")
        assert not_last.filter("fill <> 64").count() == 0
        assert fills.filter("fill > 64 OR fill <= 0").count() == 0
    finally:
        spans.unpersist()


def test_pack_shards_extreme_id_span(spark):
    """Ids spanning (almost) the full signed 64-bit range — the sparse
    64-bit-hash case. The bucket expression must not overflow bigint on
    ``id - lo`` (ADVICE r8): prefix sums must stay exact and id-ordered."""
    lo, hi = -(2**63), 2**63 - 1
    ids = [lo, lo + 7, -3, 0, 2**62, hi - 1, hi]
    df = spark.createDataFrame(
        [(i, "a b c", "A") for i in ids], ["doc_id", "text", "source"]
    )
    rows = sorted(
        packing.pack_shards(df, budget=6).collect(), key=lambda r: r.doc_id
    )
    # every doc is 3 tokens, budget 6 → shards 0,0,1,1,2,2,3 in id order
    assert [r.doc_id for r in rows] == sorted(ids)
    assert [r.shard_id for r in rows] == [0, 0, 1, 1, 2, 2, 3]


def test_pack_shards_bucketing_order_aligned_random_ids(spark):
    """Property: for ANY int64 id set (clustered, sparse, extreme), the
    two-phase bucketed prefix sum equals the single-window ground truth —
    the double-cast bucket key only has to be order-aligned (non-strictly
    monotone in id), never collision-free (ADVICE r8)."""
    import random

    rng = random.Random(17)
    ids = set()
    # mixed regimes: dense small, clustered offsets, full-range extremes
    ids.update(rng.sample(range(1000), 40))
    base = rng.randrange(-(2**62), 2**62)
    ids.update(base + i for i in range(30))
    ids.update(rng.randrange(-(2**63), 2**63 - 1) for _ in range(30))
    ids.update([-(2**63), 2**63 - 1, 0])
    rows = [
        (i, "t " * (1 + (abs(i) % 7)), "s" + str(abs(i) % 3)) for i in ids
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r.source, r.doc_id): r.shard_id
        for r in packing.pack_shards(df, budget=10).collect()
    }
    # ground truth: per-source running token sum in id order
    expect = {}
    for src in sorted({r[2] for r in rows}):
        cum = 0
        for i in sorted(x[0] for x in rows if x[2] == src):
            n_tok = 1 + (abs(i) % 7)
            expect[(src, i)] = cum // 10
            cum += n_tok
    assert got == expect


class TestPackInterleaved:
    def test_segments_partition_exactly_with_modalities(self, spark):
        """Interleaved packing invariants: chunks of one segment across
        consecutive sequences partition its tokens exactly, sequences
        fill to seq_len except the last per group, and modality rides
        through to every chunk row."""
        from pyspark.sql import functions as F

        from shopify_etl_spark.operators.packing import pack_interleaved

        rows = []
        for d in range(6):
            rows.append(("web", d, d * 2, "image", 5 + d % 3))
            rows.append(("web", d, d * 2 + 1, "text", 20 + 7 * d))
        segs = spark.createDataFrame(
            rows,
            "source string, doc_id long, seg_key long, modality string, "
            "n_tokens long",
        )
        out = pack_interleaved(segs, seq_len=32).collect()
        # per-(doc, modality) chunk lens sum to the segment's n_tokens
        got = {}
        for r in out:
            got[(r.doc_id, r.modality)] = got.get(
                (r.doc_id, r.modality), 0
            ) + r.chunk_len
            assert 0 < r.chunk_len <= 32
            assert 0 <= r.seq_start < 32
        want = {(d, m): n for (_s, d, _k, m, n) in rows}
        assert got == want
        # every sequence except the last is exactly full
        per_seq = {}
        for r in out:
            per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.chunk_len
        last = max(per_seq)
        assert all(v == 32 for s, v in per_seq.items() if s != last)
        # interleave order: within a sequence, a doc's image chunk
        # starts before its text chunk
        pos = {(r.doc_id, r.modality, r.seq_id): r.seq_start for r in out}
        for (d, m, s), st in pos.items():
            if m == "image" and (d, "text", s) in pos:
                assert st < pos[(d, "text", s)]

    def test_zero_token_segments_pack_nothing(self, spark):
        from shopify_etl_spark.operators.packing import pack_interleaved

        segs = spark.createDataFrame(
            [("a", 1, 2, "image", 0), ("a", 1, 3, "text", 10)],
            "source string, doc_id long, seg_key long, modality string, "
            "n_tokens long",
        )
        out = pack_interleaved(segs, seq_len=8).collect()
        assert {r.modality for r in out} == {"text"}
        assert sum(r.chunk_len for r in out) == 10


def test_png_patch_grid_from_decoded_raster(spark):
    """Patch counts come from the DECODE, not metadata: a synth asset's
    grid equals ceil(h/4)*ceil(w/4) of the synthesis geometry, and the
    pixel sum equals the generator formula."""
    from shopify_etl_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(d,) for d in range(12)], "doc_id long"
    )
    out = {
        r.asset_id: r
        for r in multimodal.png_patch_grid(
            multimodal.synth_png_assets(docs)
        ).collect()
    }
    for d in range(12):
        w, h = 8 + d % 5, 6 + d % 4
        r = out[d]
        assert (r.width, r.height) == (w, h)
        assert r.n_patches == (-(-h // 4)) * (-(-w // 4))
        want_sum = sum(
            (d * 31 + rr * 17 + cc * 7) % 256
            for rr in range(h) for cc in range(w)
        )
        assert r.pixel_sum == want_sum
