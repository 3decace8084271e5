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


# ---------------------------------------------------------------- WAV codec

from shopify_etl_spark.operators.wav_codec import decode_wav, encode_wav  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_int16_any_shape(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, (n, ch), dtype=np.int64).astype(np.int16)
    back, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert back.shape == (n, ch)
    # int16 -> float32/32768 is exact; invert exactly
    assert (np.round(back * 32768.0).astype(np.int16) == samples).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 64),
    junk=st.binary(min_size=0, max_size=9),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_chunk_walk_skips_unknown_and_odd_chunks(n, junk, seed):
    """A LIST chunk (possibly odd-sized — RIFF pads to even) inserted
    between fmt and data must be skipped without disturbing the samples."""
    import struct

    rng = np.random.default_rng(seed)
    samples = rng.integers(-1000, 1000, (n, 1), dtype=np.int64).astype(np.int16)
    blob = encode_wav(samples, 8000)
    # splice LIST chunk right before the data chunk
    di = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", len(junk)) + junk + (b"\x00" if len(junk) % 2 else b"")
    patched = blob[:di] + extra + blob[di:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    back, rate = decode_wav(patched)
    assert rate == 8000
    assert (np.round(back * 32768.0).astype(np.int16) == samples).all()


def test_wav_bit_depths_and_float_and_seam():
    import struct

    import pytest

    def raw_wav(fmt_tag, bits, pcm, n_ch=1, rate=8000):
        fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, rate, rate * n_ch * bits // 8,
                          n_ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 8-bit unsigned: 128 -> 0.0, 0 -> -1.0, 255 -> ~0.992
    back, _ = decode_wav(raw_wav(1, 8, bytes([128, 0, 255])))
    assert np.allclose(back.ravel(), [0.0, -1.0, 127 / 128], atol=1e-6)
    # 24-bit signed little-endian: max positive / -1 / min negative
    pcm24 = b"\xff\xff\x7f" + b"\xff\xff\xff" + b"\x00\x00\x80"
    back, _ = decode_wav(raw_wav(1, 24, pcm24))
    assert np.allclose(back.ravel(), [(2**23 - 1) / 2**23, -1 / 2**23, -1.0])
    # 32-bit int
    pcm32 = struct.pack("<ii", 2**31 - 1, -(2**31))
    back, _ = decode_wav(raw_wav(1, 32, pcm32))
    assert np.allclose(back.ravel(), [(2**31 - 1) / 2**31, -1.0])
    # float32 passthrough
    pcmf = struct.pack("<ff", 0.25, -0.5)
    back, _ = decode_wav(raw_wav(3, 32, pcmf))
    assert np.allclose(back.ravel(), [0.25, -0.5])
    # compressed tag -> honest seam
    with pytest.raises(NotImplementedError):
        decode_wav(raw_wav(0x0055, 16, b"\x00\x00"))  # 0x55 = MP3
    # garbage -> ValueError, not a crash
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)
