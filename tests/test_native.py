"""Native C++ clip decoder vs PIL: decode/resize parity and batch API."""

import io

import numpy as np
import pytest
from PIL import Image

from vae2_tpu import native


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.fixture(scope="module")
def available():
    if native.decode_frame(_png_bytes(np.zeros((4, 4, 3), np.uint8)), 4, 4) \
            is None:
        pytest.skip("native decoder unavailable")
    return True


def test_png_identity_decode(available):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    out = native.decode_frame(_png_bytes(img), 48, 32)
    np.testing.assert_array_equal(out, img)  # same size: lossless roundtrip


def _ref_resize_1d(src, dst_len):
    """Exact float antialiased triangle filter (support=scale, half-pixel
    centers) — the algorithm PIL BILINEAR / jax.image implement with
    quantization; ground truth for the native resize."""
    s = src.shape[0] / dst_len
    sup = max(s, 1.0)
    out = np.zeros((dst_len,) + src.shape[1:], np.float64)
    for i in range(dst_len):
        c = (i + 0.5) * s - 0.5
        lo, hi = int(np.floor(c - sup)), int(np.ceil(c + sup))
        wsum, acc = 0.0, 0.0
        for j in range(lo, hi + 1):
            w = max(0.0, 1.0 - abs(j - c) / sup)
            if w == 0.0:
                continue
            acc = acc + w * src[min(max(j, 0), src.shape[0] - 1)]
            wsum += w
        out[i] = acc / wsum
    return out


def test_png_resize_antialiased_downscale(available):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 96, 3), np.uint8)
    out = native.decode_frame(_png_bytes(img), 48, 32)
    ref = _ref_resize_1d(
        _ref_resize_1d(img.astype(np.float64), 32).transpose(1, 0, 2),
        48).transpose(1, 0, 2)
    diff = np.abs(out.astype(float) - ref)
    assert diff.max() <= 1.0, (diff.mean(), diff.max())  # rounding only


def test_jpeg_decode(available):
    img = np.full((32, 32, 3), 128, np.uint8)
    out = native.decode_frame(_jpeg_bytes(img), 32, 32)
    assert out is not None
    assert np.abs(out.astype(int) - 128).max() <= 4  # jpeg lossy tolerance


def test_batch_decode_matches_single(available):
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (40, 60, 3), np.uint8) for _ in range(5)]
    datas = [_png_bytes(im) for im in imgs]
    batch = native.decode_batch(datas, 30, 20, threads=3)
    assert batch.shape == (5, 20, 30, 3)
    for i, d in enumerate(datas):
        single = native.decode_frame(d, 30, 20)
        np.testing.assert_array_equal(batch[i], single)


def test_corrupt_frame_zero_filled(available):
    good = _png_bytes(np.full((8, 8, 3), 7, np.uint8))
    batch = native.decode_batch([good, b"not an image"], 8, 8)
    assert (batch[0] == 7).all()
    assert (batch[1] == 0).all()


def test_grayscale_and_palette_png(available):
    gray = np.random.RandomState(3).randint(0, 255, (16, 16), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, format="PNG")
    out = native.decode_frame(buf.getvalue(), 16, 16)
    assert out is not None
    np.testing.assert_array_equal(out[..., 0], gray)
    np.testing.assert_array_equal(out[..., 1], gray)

    pal = Image.fromarray(
        np.random.RandomState(4).randint(0, 255, (16, 16, 3), np.uint8)
    ).convert("P")
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    out = native.decode_frame(buf.getvalue(), 16, 16)
    ref = np.asarray(pal.convert("RGB"), np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_concurrent_first_load_no_race(tmp_path, monkeypatch):
    """8 threads hitting a cold cache must all succeed (or all fall back) —
    regression: the first flagship run crashed when 4 loader threads built
    to one shared .tmp and the losers' os.replace raised FileNotFoundError."""
    import concurrent.futures as cf
    import importlib

    from vae2_tpu import native as nat

    monkeypatch.setenv("VAE2_NATIVE_CACHE", str(tmp_path / "cold_cache"))
    importlib.reload(nat)  # reset _lib/_load state for a genuine first load
    data = _png_bytes(np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3))
    with cf.ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(lambda _: nat.decode_frame(data, 4, 4),
                             range(8)))
    # never an exception; all threads agree on availability
    assert all((o is None) == (outs[0] is None) for o in outs)
    importlib.reload(nat)  # restore default cache for other tests
