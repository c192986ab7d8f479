"""Baseline JPEG codec (functions/jpeg.py): JPEG is lossy, so these
tests assert BOUNDED reconstruction error (the bit-exact contracts live
with the PNG/BMP/GIF/WAV codecs), plus exact structural invariants —
flat blocks reconstruct exactly, all sampling/restart variants agree
with the 4:4:4 stream, and unsupported shapes raise honestly."""

import numpy as np
import pytest

from spaghettisearch_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.linspace(10, 245, w)[None, :]
    px[:, :, 1] = np.linspace(245, 10, h)[:, None]
    px[:, :, 2] = 128
    return px


def test_flat_image_exact():
    for val in (0, 77, 128, 255):
        flat = np.full((16, 24, 3), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert int(np.abs(out.astype(int) - val).max()) <= 1, val


def test_gradient_bounded_error():
    # bounds tight enough that the dequant-indexing class of bug cannot
    # hide (the zigzag/natural mix-up measured mean ~2.0 here vs ~0.7)
    px = _gradient(48, 64)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    err = np.abs(out.astype(int) - px.astype(int))
    assert out.shape == px.shape
    assert float(err.mean()) < 1.5 and int(err.max()) < 12


def test_random_q95_tight_bound():
    """Random content at quality 95: mean error stays in low single
    digits with correct per-frequency dequantization (the zigzag
    mix-up measured ~37 here before the fix)."""
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert float(np.abs(out.astype(int) - px.astype(int)).mean()) < 8.0


def test_non_multiple_of_8_dims():
    # edge-replicate padding must not leak into the cropped output
    px = _gradient(13, 21)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == (13, 21, 3)
    # the 21-px-wide gradient steps ~11 levels/pixel — steep content,
    # so the quantization-error budget is wider than the smooth cases
    err = np.abs(out.astype(int) - px.astype(int))
    assert float(err.mean()) < 10.0


def test_grayscale_single_component():
    g = np.tile(np.linspace(0, 255, 32).astype(np.uint8), (17, 1))
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (17, 32, 3)
    # all three channels identical (grayscale replication)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert float(np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean()) < 6.0


def test_subsample_and_restart_variants_agree():
    """4:2:0 and restart-interval streams exercise the decoder's
    multi-block MCU + RST alignment paths; on a constant-chroma image
    every variant must reconstruct the SAME pixels as plain 4:4:4
    (chroma decimation of a constant is lossless)."""
    x = np.linspace(0, 255, 40).astype(np.uint8)
    px = np.stack([np.tile(x, (36, 1))] * 3, axis=-1)
    base = decode_jpeg(encode_jpeg(px, quality=90))
    for kwargs in (
        {"subsample": True},
        {"subsample": "420"},
        {"subsample": "422"},
        {"restart_interval": 2},
        {"subsample": True, "restart_interval": 1},
        {"subsample": "422", "restart_interval": 2},
    ):
        out = decode_jpeg(encode_jpeg(px, quality=90, **kwargs))
        assert np.array_equal(out, base), kwargs
    # on a chroma GRADIENT the loss ordering is 4:4:4 <= 4:2:2 <= 4:2:0
    g = np.zeros((32, 32, 3), dtype=np.uint8)
    g[:, :, 0] = np.linspace(50, 200, 32)[None, :]
    g[:, :, 2] = np.linspace(50, 200, 32)[:, None]
    errs = [
        float(np.abs(
            decode_jpeg(encode_jpeg(g, quality=90, subsample=s)).astype(int)
            - g.astype(int)
        ).mean())
        for s in (False, "422", "420")
    ]
    assert errs[0] <= errs[1] <= errs[2], errs


def test_quality_monotone():
    px = _gradient(32, 32)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(px, quality=q))
        errs.append(float(np.abs(out.astype(int) - px.astype(int)).mean()))
    assert errs[0] >= errs[1] >= errs[2], errs


def test_honest_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    # progressive SOF2 must raise NotImplementedError, not mis-decode
    px = _gradient(16, 16)
    payload = bytearray(encode_jpeg(px))
    i = bytes(payload).index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # truncated entropy data (original stream, cut inside the scan) —
    # must be ValueError specifically, the contract the other codecs
    # follow (wrappers catch ValueError to make error rows)
    orig = encode_jpeg(px)
    with pytest.raises(ValueError):
        decode_jpeg(orig[: len(orig) - len(orig) // 3])


def test_real_decode_dispatch():
    from spaghettisearch_spark.operators.multimodal import real_decode

    px = _gradient(24, 30)
    w, h, n, feat = real_decode(encode_jpeg(px, quality=90))
    assert (w, h, n) == (30, 24, 1) and feat.shape == (8,)


def test_property_random_roundtrip():
    """Property-ish sweep: random small images across qualities,
    sampling modes, and odd dimensions never crash, preserve shape, and
    keep reconstruction error inside a generous quantization budget
    (random noise is JPEG's worst case; the bound is loose by design —
    the point is structural correctness across the parameter grid)."""
    rng = np.random.RandomState(42)
    for trial in range(6):
        h = int(rng.randint(5, 40))
        w = int(rng.randint(5, 40))
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        q = int(rng.choice([40, 70, 95]))
        sub = bool(rng.randint(2))
        rst = int(rng.choice([0, 1, 3]))
        out = decode_jpeg(
            encode_jpeg(px, quality=q, subsample=sub, restart_interval=rst)
        )
        assert out.shape == (h, w, 3), (trial, h, w)
        err = float(np.abs(out.astype(int) - px.astype(int)).mean())
        assert err < 60.0, (trial, q, sub, rst, err)
