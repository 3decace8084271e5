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


# ------------------------------------------------------- IMA ADPCM (0x0011)

from shopify_etl_spark.operators.wav_codec import (  # noqa: E402
    _ima_decode_nibbles,
    _ima_encode_samples,
    encode_wav_adpcm,
)


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    err = got - ref
    return 10.0 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-12))


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_shape_and_frame_count_exact(n, ch, seed):
    """fact-chunk trimming: any length, any channel count round-trips to
    EXACTLY (n, ch) — the padded final block must not leak samples."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, (n, ch), dtype=np.int64).astype(
        np.int16
    )
    back, rate = decode_wav(encode_wav_adpcm(samples, 8000))
    assert rate == 8000
    assert back.shape == (n, ch)
    assert np.abs(back).max() <= 1.0


def test_adpcm_sine_snr_and_ratio():
    """Codec quality contract: a band-limited signal reconstructs above
    25 dB SNR (IMA ADPCM's expected ~2 bits of noise) at the expected
    ~4:1 compression, and stereo channels stay independent."""
    t = np.arange(16000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 997 * t)
    s16 = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    stereo = np.stack([s16, np.roll(s16, 31)], axis=1)
    blob = encode_wav_adpcm(stereo, 16000)
    back, _ = decode_wav(blob)
    ref = stereo.astype(np.float32) / 32768.0
    assert _snr_db(ref[:, 0], back[:, 0]) > 25
    assert _snr_db(ref[:, 1], back[:, 1]) > 25
    pcm_size = len(encode_wav(stereo, 16000))
    assert len(blob) < 0.30 * pcm_size  # ~4:1 with headers
    # mono too (odd length -> partial last block)
    back1, _ = decode_wav(encode_wav_adpcm(s16[:12345], 16000))
    assert back1.shape == (12345, 1)
    assert _snr_db(ref[:12345, 0], back1[:, 0]) > 25


def test_adpcm_encode_decode_state_walk_mirrors():
    """The encoder tracks the decoder's reconstruction exactly: feeding
    the encoder's nibbles back through the decoder from the same state
    yields the encoder's own predictor path (bit-exact shift-add form),
    and each step's error is bounded by the current step size."""
    rng = np.random.default_rng(3)
    samples = rng.integers(-4000, 4000, 300).astype(np.int16)
    nibs, end_pred, end_idx = _ima_encode_samples(samples, 0, 0)
    dec, d_pred, d_idx = _ima_decode_nibbles(nibs, 0, 0)
    assert (d_pred, d_idx) == (end_pred, end_idx)
    assert dec[-1] == end_pred


def test_adpcm_block_independence():
    """Each block header re-seeds (predictor, index): decoding only the
    second block of a 2-block stream must equal the tail of the full
    decode — the property that makes ADPCM splittable at scale."""
    import struct

    rng = np.random.default_rng(11)
    spb = 1 + 8 * 63  # 505 samples/block at the default block_words
    samples = (2000 * np.sin(np.arange(2 * spb) / 7)).astype(np.int16)
    blob = encode_wav_adpcm(samples, 8000)
    full, _ = decode_wav(blob)
    # locate the data chunk and rebuild a wav holding only block #2
    di = blob.index(b"data")
    (dsize,) = struct.unpack("<I", blob[di + 4 : di + 8])
    data = blob[di + 8 : di + 8 + dsize]
    block_align = len(data) // 2
    blk2 = data[block_align:]
    patched = (
        blob[:di]
        + b"data"
        + struct.pack("<I", len(blk2))
        + blk2
    )
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    # drop the fact chunk's count below the single-block frame total
    fi = patched.index(b"fact")
    patched = (
        patched[:fi + 8] + struct.pack("<I", spb) + patched[fi + 12 :]
    )
    tail, _ = decode_wav(patched)
    assert tail.shape == (spb, 1)
    assert np.array_equal(tail[:, 0], full[spb : 2 * spb, 0])


def test_adpcm_3bit_seam():
    """3-bit IMA nibbles are a documented seam, not silent garbage."""
    import struct

    import pytest

    fmt = struct.pack("<HHIIHHHH", 0x0011, 1, 8000, 4055, 256, 4, 2, 505)
    fmt = fmt[:14] + struct.pack("<H", 3) + fmt[16:]  # bits=3
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 256) + b"\x00" * 256
    )
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


from shopify_etl_spark.operators.jpeg_codec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 41),
    w=st.integers(1, 41),
    channels=st.sampled_from([1, 3]),
    quality=st.integers(1, 100),
    subsampling=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_any_input(
    h, w, channels, quality, subsampling, seed
):
    """Progressive and baseline streams decode bit-identically for ANY
    raster/quality/shape/subsampling — the contract holds by construction
    (identical quantized coefficients; one shared IDCT/assembly path), so
    even pure noise with no PSNR guarantee must match exactly
    (VERDICT r8 #7)."""
    if channels == 1:
        subsampling = "444"  # 4:2:0 is 3-component only
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsampling=subsampling)
    )
    assert base.shape == img.shape
    assert np.array_equal(prog, base)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(1, 100),
    restart=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_baseline_restart_intervals_do_not_change_pixels(
    h, w, quality, restart, seed
):
    """DRI/RSTn layout is pure framing: the decoded raster must equal the
    no-restart stream's decode for any interval (random shapes force
    partial-MCU edges around segment boundaries)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=quality))
    rst = decode_jpeg(
        encode_jpeg(img, quality=quality, restart_interval=restart)
    )
    assert np.array_equal(plain, rst)


# -------------------------------------------- untrusted-bytes hardening
# (VERDICT r9 #5: multimodal ingest at 100 TB is undisplayable bytes by
# definition — r9 hardened JPEG/PNG; this closes WAV/ADPCM/Y4M. The
# executor-safety contract: ANY byte stream either decodes or raises
# ValueError/NotImplementedError — never struct.error/IndexError/
# ZeroDivisionError (which would fail the whole Spark task instead of
# skipping the one corrupt asset) — and allocations stay bounded by the
# input size plus the declared-geometry guards.)

from shopify_etl_spark.operators.png_codec import decode_png  # noqa: E402
from shopify_etl_spark.operators.wav_codec import (  # noqa: E402
    encode_wav_adpcm as _enc_adpcm,
)

_CLEAN = (ValueError, NotImplementedError)


def _mutate(blob: bytes, rng) -> bytes:
    s = bytearray(blob)
    for _ in range(rng.integers(1, 4)):
        op = rng.random()
        if op < 0.5 and s:
            s[int(rng.integers(len(s)))] = int(rng.integers(256))
        elif op < 0.75 and s:
            del s[int(rng.integers(len(s)))]
        else:
            s.insert(int(rng.integers(len(s) + 1)), int(rng.integers(256)))
    return bytes(s)


def _wav_streams(seed: int):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-2000, 2000, (50, 2), dtype=np.int64).astype(np.int16)
    return [encode_wav(pcm, 8000), _enc_adpcm(pcm, 8000)]


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_wav_mutations_raise_clean_errors_only(seed):
    rng = np.random.default_rng(seed)
    for blob in _wav_streams(seed):
        try:
            out, _rate = decode_wav(_mutate(blob, rng))
            # bounded: ADPCM expands 4-bit nibbles to 16-bit samples, so
            # the raster can never exceed ~4x the input bytes + headers
            assert out.nbytes <= 16 * len(blob) + 4096
        except _CLEAN:
            pass


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), frac=st.floats(0.0, 1.0))
def test_wav_truncation_any_point(seed, frac):
    for blob in _wav_streams(seed):
        cut = int(len(blob) * frac)
        try:
            decode_wav(blob[:cut])
        except _CLEAN:
            pass


def test_wav_bomb_headers_bounded():
    """Declared sizes lie upward: a fmt/data/fact chunk claiming 4 GB on
    a 100-byte stream must fail clean (or decode the actual bytes) —
    slicing bounds every chunk at the real payload, so no allocation
    follows the lie."""
    import struct

    import pytest

    # fmt declares size 16 but stream ends mid-fmt -> clean truncation
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # EXTENSIBLE tag whose chunk is too short for the SubFormat GUID ->
    # falls back to the outer tag -> honest seam, not struct.error
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + b"\x00\x00"
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="0xfffe"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # fact chunk claiming 4 bytes on a 2-byte payload is ignored, and a
    # data chunk claiming 4 GB yields only the real bytes
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"fact" + struct.pack("<I", 4) + b"\x00\x00"  # lies: only 2 bytes
    )
    # odd-size pad walks past the end -> no data chunk -> clean error
    with pytest.raises(ValueError, match="no data chunk"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x00\x00\x00\x00"
    )
    out, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out.shape == (2, 1)  # the 4 real bytes, not the declared 4 GB


def _y4m_stream(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return encode_y4m(
        [rng.integers(0, 256, (6, 9), dtype=np.uint8) for _ in range(3)]
    )


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_y4m_mutations_raise_clean_errors_only(seed):
    rng = np.random.default_rng(seed)
    blob = _y4m_stream(seed)
    try:
        frames = decode_y4m(_mutate(blob, rng))
        assert sum(f.nbytes for f in frames) <= 2 * len(blob)
    except _CLEAN:
        pass


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), frac=st.floats(0.0, 1.0))
def test_y4m_truncation_any_point(seed, frac):
    blob = _y4m_stream(seed)
    try:
        decode_y4m(blob[: int(len(blob) * frac)])
    except _CLEAN:
        pass


def test_y4m_bomb_header_rejected_before_alloc():
    """A header declaring a huge or non-positive raster on a tiny payload
    fails the geometry/truncation guards, never allocates the claim."""
    import pytest

    with pytest.raises(ValueError, match="truncated|sane bounds"):
        decode_y4m(b"YUV4MPEG2 W99999999 H99999999 Cmono\nFRAME\n\x00\x00")
    for bad in (b"W0 H5", b"W5 H0", b"W-3 H4", b"W4 H-3"):
        with pytest.raises(ValueError, match="sane bounds"):
            decode_y4m(b"YUV4MPEG2 " + bad + b" Cmono\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="non-numeric"):
        decode_y4m(b"YUV4MPEG2 Wx H4 Cmono\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="no newline"):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono")


@settings(max_examples=50, deadline=None)
@given(blob=st.binary(min_size=0, max_size=300))
def test_random_garbage_all_container_parsers(blob):
    """Pure-noise bytes through all four container decoders: clean error
    or a decode, never a crash class."""
    for dec in (decode_wav, decode_y4m, decode_png, decode_jpeg):
        try:
            dec(blob)
        except _CLEAN:
            pass


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_magic_prefixed_garbage_all_container_parsers(seed):
    """Noise wearing each container's magic walks the real parse path
    (chunk/marker/header scan) instead of bouncing off the magic check —
    and must still fail clean."""
    rng = np.random.default_rng(seed)
    junk = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
    cases = [
        (decode_wav, b"RIFF" + junk[:4] + b"WAVE" + junk),
        (decode_y4m, b"YUV4MPEG2 " + junk),
        (decode_png, b"\x89PNG\r\n\x1a\n" + junk),
        (decode_jpeg, b"\xff\xd8" + junk),
    ]
    for dec, blob in cases:
        try:
            dec(blob)
        except _CLEAN:
            pass


def test_wav_float64_decodes():
    """IEEE float64 WAV (fmt tag 3, bits=64) — studio interchange files
    use it; previously fell into the NotImplementedError seam."""
    import struct

    pcm = struct.pack("<dd", 0.25, -0.5)
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 8, 8, 64)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    back, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 48000
    assert np.allclose(back.ravel(), [0.25, -0.5])


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    channels=st.sampled_from([1, 3]),
    quality=st.integers(1, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_12bit_progressive_equals_baseline_any_input(
    h, w, channels, quality, seed
):
    """The progressive==baseline cross-path contract extends to 12-bit
    for ANY raster/quality/shape — identical quantized coefficients,
    one shared reconstruction path — so pure 12-bit noise must match
    bit-for-bit, and the output stays uint16 in [0, 4095]."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    img = rng.integers(0, 4096, shape).astype(np.uint16)
    base = decode_jpeg(encode_jpeg(img, quality=quality, precision=12))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, precision=12)
    )
    assert base.dtype == np.uint16 and base.shape == img.shape
    assert base.max(initial=0) <= 4095
    assert np.array_equal(prog, base)


@settings(max_examples=30, deadline=None)
@given(
    n_ctx=st.integers(1, 12),
    n=st.integers(0, 1500),
    seed=st.integers(0, 2**31 - 1),
)
def test_qm_coder_roundtrip_any_decision_sequence(n_ctx, n, seed):
    """The T.81 QM-coder must reproduce ANY (context, bit) sequence
    bit-exactly — per-context skews from ~0 to ~1 sweep the adaptation
    ladder, the carry pipeline, and the FF-stuffing paths the hand
    cases can't; the emitted stream must also never contain a bare
    0xFF (the framing rule markers rely on)."""
    from shopify_etl_spark.operators.jpeg_codec import (
        _QM_FIXED,
        _QMDecoder,
        _QMEncoder,
    )

    rng = np.random.default_rng(seed)
    skews = rng.uniform(0.0, 1.0, size=n_ctx + 1)
    enc = _QMEncoder()
    st_e = bytearray(n_ctx + 1)
    st_e[n_ctx] = _QM_FIXED
    bits = []
    for _ in range(n):
        ctx = int(rng.integers(0, n_ctx + 1))
        b = int(rng.random() < skews[ctx])
        bits.append((ctx, b))
        enc.encode(st_e, ctx, b)
    data = enc.flush()
    assert b"\xff" not in data.replace(b"\xff\x00", b"")
    dec = _QMDecoder(data)
    st_d = bytearray(n_ctx + 1)
    st_d[n_ctx] = _QM_FIXED
    for k, (ctx, b) in enumerate(bits):
        assert dec.decode(st_d, ctx) == b, f"decision {k}"


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.integers(5, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_arith_jpeg_matches_huffman_any_geometry(h, w, quality, seed):
    """Cross-path pixel equality must hold for ANY raster geometry and
    quality, not just the hand-picked ones — both entropy back ends
    transmit identical quantized coefficients by construction."""
    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    hh = decode_jpeg(encode_jpeg(img, quality=quality))
    aa = decode_jpeg(encode_jpeg_arith(img, quality=quality))
    assert np.array_equal(hh, aa)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_any_shape(h, w, n_colors, interlace, seed):
    """GIF is lossless for palettized content: ANY raster shape, palette
    size (1..256 sweeps every LZW minimum code size), and row order must
    round-trip pixel-exactly."""
    from shopify_etl_spark.operators.gif_codec import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    frames = decode_gif(encode_gif([img], pal, interlace=interlace))
    assert len(frames) == 1
    assert np.array_equal(frames[0], pal[img])


@given(
    n=st.integers(1, 600),
    ch=st.integers(1, 3),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_g711_roundtrip_within_companding_error(n, ch, law, seed):
    """G.711 is lossy (8-bit log companding of 16-bit samples): the
    round-trip error is bounded by the widest segment's half-step —
    ~1/32 full scale for µ-law (segment 7 step 256 in the 14-bit
    domain → 1024 in 16-bit), ~1/16 for A-law's 13-bit domain."""
    from shopify_etl_spark.operators.wav_codec import (
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    back, rate = decode_wav(encode_wav_g711(samples, 8000, law))
    assert rate == 8000 and back.shape == (n, ch)
    err = np.abs(back * 32768.0 - samples.astype(np.float32))
    assert float(err.max()) <= (1024 if law == "ulaw" else 2048)


# ------------------------------------------------------ r12 codec reach


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    predictor=st.integers(1, 7),
    precision=st.sampled_from([8, 12, 16]),
    interleave=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_lossless_jpeg_roundtrip_any_shape_predictor_precision(
    h, w, ch, predictor, precision, interleave, seed
):
    """SOF3 is lossless: decode(encode(x)) == x for EVERY shape,
    predictor, precision and scan layout — the property the 183-case
    unit matrix samples, searched adversarially here."""
    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(seed)
    dt = np.uint8 if precision == 8 else np.uint16
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 1 << precision, shape, dtype=dt)
    got = decode_jpeg(
        encode_jpeg_lossless(
            img, predictor=predictor, precision=precision,
            interleave=interleave,
        )
    )
    assert got.dtype == img.dtype and np.array_equal(got, img)


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    kind=st.sampled_from(
        ["gray8", "gray16", "rgb8", "rgb16", "rgba8", "gray1", "gray2",
         "gray4", "pal"]
    ),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_full_spec_roundtrip_any_geometry(h, w, kind, interlace, seed):
    """Full-spec PNG: every color-type/depth combination round-trips
    losslessly under both interlace modes at ANY geometry (Adam7's
    empty-pass and 1-pixel-pass corners included)."""
    from shopify_etl_spark.operators.png_codec import (
        decode_png,
        encode_png,
        encode_png_gray,
        encode_png_paletted,
    )

    rng = np.random.default_rng(seed)
    if kind in ("gray8", "gray16", "rgb8", "rgb16", "rgba8"):
        depth = 16 if kind.endswith("16") else 8
        ch = {"gray": 1, "rgb": 3, "rgba": 4}[kind.rstrip("816")]
        dt = np.uint16 if depth == 16 else np.uint8
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.integers(0, 1 << depth, shape, dtype=dt)
        got = decode_png(encode_png(img, interlace=interlace))
        assert got.dtype == img.dtype and np.array_equal(got, img)
    elif kind == "pal":
        npal = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
        got = decode_png(encode_png_paletted(idx, pal, interlace=interlace))
        assert np.array_equal(got, pal[idx])
    else:
        d = int(kind[4:])
        img = rng.integers(0, 1 << d, (h, w), dtype=np.uint8)
        got = decode_png(encode_png_gray(img, d, interlace=interlace))
        assert np.array_equal(got, img * (255 // ((1 << d) - 1)))


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    ch=st.sampled_from([1, 3]),
    quality=st.integers(5, 95),
    subsampling=st.sampled_from(["444", "420", "422", "411", "440"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_prog_arith_jpeg_equals_baseline_any_geometry(
    h, w, ch, quality, subsampling, seed
):
    """SOF10 shares the coefficient front half with SOF0, so the two
    decodes must agree bit-for-bit at ANY geometry/quality/layout."""
    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith_progressive,
    )

    if ch == 1:
        subsampling = "444"
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsampling=subsampling))
    got = decode_jpeg(
        encode_jpeg_arith_progressive(img, quality=quality,
                                      subsampling=subsampling)
    )
    assert np.array_equal(base, got)


# ---------------------------------------------------------------------------
# Hierarchical JPEG (T.81 Annex J, r13) — randomized pyramid geometry
# across the whole mode matrix must round-trip exactly (the refinement
# frame corrects every sample), and mutated streams must fail cleanly.
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    levels=st.integers(1, 3),
    base=st.sampled_from(["lossless", "lossless_arith", "baseline"]),
    dct=st.sampled_from([None, "seq", "prog"]),
    arith=st.booleans(),
    channels=st.sampled_from([1, 3]),
    predictor=st.integers(1, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_hierarchical_roundtrip_any_pyramid(
    h, w, levels, base, dct, arith, channels, predictor, seed
):
    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    # respect the documented mode constraints instead of filtering them
    # out of the strategy (keeps example diversity high)
    if base == "baseline" and channels == 3:
        base = "lossless"
    if dct is not None and channels == 3:
        dct = None
    if base == "baseline" and levels == 1:
        levels = 2
    if min(h, w) >> (levels - 1) < 1:
        levels = 1 + max(0, min(h, w).bit_length() - 1)
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    blob = encode_jpeg_hierarchical(
        img, levels=levels, base=base, quality=70, predictor=predictor,
        arith=arith, dct_refine=dct is not None,
        dct_mode=dct or "seq",
    )
    got = decode_jpeg(blob)
    assert got.dtype == img.dtype and np.array_equal(got, img)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(6, 24),
    w=st.integers(6, 24),
    levels=st.integers(2, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_hierarchical_16bit_roundtrip(h, w, levels, seed):
    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    if min(h, w) >> (levels - 1) < 1:
        levels = 2
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg_hierarchical(img, levels=levels))
    assert got.dtype == np.uint16 and np.array_equal(got, img)


def test_fuzz_hierarchical_clean_errors_only():
    """800-trial mutation fuzz over four hierarchical stream shapes:
    every mutation must decode, raise ValueError, or raise
    NotImplementedError — never crash, hang, or leak a raw numpy/struct
    error (the executor-safety contract every codec here pins)."""
    import random

    from shopify_etl_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rnd = random.Random(13)
    rng = np.random.default_rng(13)
    g = rng.integers(0, 256, (20, 16), dtype=np.uint8)
    c = rng.integers(0, 256, (14, 18, 3), dtype=np.uint8)
    g16 = rng.integers(0, 65536, (10, 12), dtype=np.uint16)
    streams = [
        encode_jpeg_hierarchical(g, levels=3),
        encode_jpeg_hierarchical(c, levels=2, base="lossless_arith",
                                 arith=True),
        encode_jpeg_hierarchical(g, levels=3, base="baseline",
                                 dct_refine=True, dct_mode="prog"),
        encode_jpeg_hierarchical(g16, levels=2),
    ]
    for _ in range(800):
        s = bytearray(rnd.choice(streams))
        for _ in range(rnd.randint(1, 3)):
            op = rnd.random()
            if op < 0.5:
                s[rnd.randrange(len(s))] = rnd.randrange(256)
            elif op < 0.75:
                del s[rnd.randrange(len(s))]
            else:
                s.insert(rnd.randrange(len(s)), rnd.randrange(256))
        try:
            decode_jpeg(bytes(s), max_pixels=1_000_000)
        except (ValueError, NotImplementedError):
            pass
