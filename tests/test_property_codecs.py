"""Property-based codec/sketch invariants: randomized inputs must
round-trip (Y4M) and respect published guarantees (CMS lower bound,
merge associativity) — the shapes and multisets the hand-built cases
can't sweep. The Y4M properties are pure numpy; the CMS properties run
on the suite's shared local session with a deliberately tiny grid
(width 16) so collisions actually occur and the lower bound is
exercised, not vacuous."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shopify_etl_spark.operators.y4m_codec import decode_y4m, encode_y4m


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    n_frames=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_any_shape(h, w, n_frames, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n_frames)]
    back = decode_y4m(encode_y4m(frames))
    assert len(back) == n_frames
    for a, b in zip(frames, back):
        assert a.shape == b.shape and (a == b).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(2, 8).map(lambda x: x * 2),  # 4:2:0 needs even dims
    w=st.integers(2, 8).map(lambda x: x * 2),
    n_frames=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_c420_planes_partition_the_payload(h, w, n_frames, seed):
    """Hand-built 4:2:0 streams: every luma/chroma byte decodes back in
    place, for any even geometry and frame count."""
    rng = np.random.default_rng(seed)
    chunks = []
    truth = []
    for _ in range(n_frames):
        luma = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        truth.append((luma, u, v))
        chunks.append(b"FRAME\n" + luma.tobytes() + u.tobytes() + v.tobytes())
    stream = (f"YUV4MPEG2 W{w} H{h} F25:1 C420\n").encode() + b"".join(chunks)
    lumas = decode_y4m(stream)  # luma_only default
    full = decode_y4m(stream, luma_only=False)
    assert len(lumas) == len(full) == n_frames
    for (tl, tu, tv), gl, (fl, fu, fv) in zip(truth, lumas, full):
        assert (gl == tl).all()
        assert (fl == tl).all() and (fu == tu).all() and (fv == tv).all()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=60
    ),
    split=st.integers(1, 59),
)
def test_cms_lower_bound_and_merge_associativity(spark, tokens, split):
    """CMS guarantees over random multisets: estimate >= true for EVERY
    key (always — collisions only add), and sketching two halves then
    cellwise-merging equals sketching the whole stream."""
    from pyspark.sql import functions as F

    from shopify_etl_spark.operators import sketches

    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    whole = sketches.cms_build(df, "token", width=16, depth=2)

    keys = df.distinct()
    est = {
        r.token: r.cms_count
        for r in sketches.cms_query(whole, keys, "token", width=16, depth=2).collect()
    }
    true = {
        r.token: r.n
        for r in df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in true.items():
        assert est[k] >= n, (k, est[k], n)

    cut = min(split, len(tokens))
    a = spark.createDataFrame([(t,) for t in tokens[:cut]] or [("‽",)], ["token"])
    b = spark.createDataFrame([(t,) for t in tokens[cut:]] or [("‽",)], ["token"])
    merged = sketches.cms_merge(
        sketches.cms_build(a, "token", width=16, depth=2),
        sketches.cms_build(b, "token", width=16, depth=2),
    )
    if cut and cut < len(tokens):  # both halves non-empty: exact equality
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )
