"""Native JPEG/PNG decode + canonicalize loader (native/rlcf_host.cpp codec
section) vs the PIL path it replaces (`transforms.load_image` +
`resize_short_side_pil` + `center_crop`).

Decode itself must be bit-identical (same libjpeg family; PNG is lossless).
The canonical square uses the native bicubic `resize_box` kernel, which the
existing native tests hold to tolerance vs PIL (fixed-point/ordering
differences), so the canonical assertions are tolerance-based too.
"""

import io
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from rlcf_tpu.data import native  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native.decode_available(), reason="native library built without codecs"
)


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _encode(img: np.ndarray, fmt: str, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=fmt, **kw)
    return buf.getvalue()


def test_png_decode_bit_exact():
    img = _rand_img(123, 77, seed=1)
    dec = native.decode_rgb_native(_encode(img, "PNG"))
    np.testing.assert_array_equal(dec, img)


def test_jpeg_decode_matches_pil():
    img = _rand_img(200, 317, seed=2)
    data = _encode(img, "JPEG", quality=92)
    dec = native.decode_rgb_native(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # both decode through libjpeg-turbo; allow a couple of gray levels in
    # case a host pairs different IDCT builds
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 2


def test_grayscale_jpeg_and_palette_png():
    gray = np.random.default_rng(3).integers(0, 256, (64, 48), dtype=np.uint8)
    data = _encode(np.repeat(gray[..., None], 3, axis=-1), "JPEG", quality=95)
    # re-encode as true grayscale
    buf = io.BytesIO()
    Image.open(io.BytesIO(data)).convert("L").save(buf, format="JPEG", quality=95)
    data = buf.getvalue()
    dec = native.decode_rgb_native(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 2

    img = _rand_img(40, 52, seed=4)
    buf = io.BytesIO()
    Image.fromarray(img).convert("P", palette=Image.ADAPTIVE).save(buf, format="PNG")
    pdata = buf.getvalue()
    dec = native.decode_rgb_native(pdata)
    ref = np.asarray(Image.open(io.BytesIO(pdata)).convert("RGB"))
    np.testing.assert_array_equal(dec, ref)


def test_rgba_png_drops_alpha_like_pil():
    rgba = np.random.default_rng(5).integers(0, 256, (33, 47, 4), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgba, mode="RGBA").save(buf, format="PNG")
    dec = native.decode_rgb_native(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    np.testing.assert_array_equal(dec, ref)


def test_unsupported_container_returns_none():
    assert native.decode_rgb_native(b"\x00\x01not an image") is None
    assert native.load_canonical_native(b"GIF89a....", 64) is None


def _insert_png_chunk(data: bytes, chunk_type: bytes, payload: bytes) -> bytes:
    """Insert a chunk right after IHDR (signature 8B + IHDR 25B)."""
    import struct
    import zlib

    pos = 8 + 25
    chunk = struct.pack(">I", len(payload)) + chunk_type + payload
    chunk += struct.pack(">I", zlib.crc32(chunk_type + payload) & 0xFFFFFFFF)
    return data[:pos] + chunk + data[pos:]


def test_gamma_tagged_png_matches_pil():
    # PIL ignores gAMA; the decoder must too (the libpng simplified API
    # would gamma-convert to sRGB — that's why the full API is used)
    import struct

    img = _rand_img(30, 44, seed=11)
    data = _encode(img, "PNG")
    tagged = _insert_png_chunk(data, b"gAMA", struct.pack(">I", 100000))  # gamma 1.0
    ref = np.asarray(Image.open(io.BytesIO(tagged)).convert("RGB"))
    np.testing.assert_array_equal(ref, img)  # PIL ignores the chunk
    dec = native.decode_rgb_native(tagged)
    np.testing.assert_array_equal(dec, img)


def test_bomb_header_refused():
    # IHDR claiming 65000x65000 (4.2 Gpx) must be refused without allocating
    import struct

    data = bytearray(_encode(_rand_img(8, 8, seed=12), "PNG"))
    data[16:24] = struct.pack(">II", 65000, 65000)  # width, height
    import zlib

    crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF  # type+payload
    data[29:33] = struct.pack(">I", crc)
    assert native.load_canonical_native(bytes(data), 64) is None


def test_truncated_jpeg_and_cmyk_fall_back():
    img = _rand_img(40, 50, seed=9)
    data = _encode(img, "JPEG", quality=90)
    # libjpeg would gray-pad a truncated stream; we must refuse (PIL raises)
    assert native.decode_rgb_native(data[: len(data) // 2]) is None
    # CMYK colorspace -> unsupported by the JCS_RGB fast path -> PIL fallback
    buf = io.BytesIO()
    Image.fromarray(img).convert("CMYK").save(buf, format="JPEG", quality=90)
    assert native.decode_rgb_native(buf.getvalue()) is None


@pytest.mark.parametrize("shape", [(300, 500), (500, 300), (256, 256), (97, 311)])
def test_load_canonical_matches_pil_two_step(shape):
    from rlcf_tpu.data.transforms import center_crop, resize_short_side_pil

    img = _rand_img(*shape, seed=shape[0])
    data = _encode(img, "PNG")  # lossless: isolates the resize comparison
    can = native.load_canonical_native(data, 128)
    ref = center_crop(resize_short_side_pil(img, 128), 128)
    assert can.shape == ref.shape == (128, 128, 3)
    d = np.abs(can.astype(int) - ref.astype(int))
    # random-noise input is the adversarial case for resampling-kernel
    # differences (PIL's 8-bit fixed-point taps vs the native float taps),
    # worst on upscale; measured: mean 0.20-0.26, >2 on 0.03-0.7% of pixels
    assert d.mean() < 1.0, d.mean()
    assert (d > 8).mean() < 2e-3, (d > 8).mean()


def _make_image_folder(root, n_per_class=3, fmts=("JPEG", "PNG")):
    rng = np.random.default_rng(0)
    k = 0
    for cls in ("alpha", "beta"):
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(n_per_class):
            img = rng.integers(0, 256, (90 + 7 * k, 120 - 5 * k, 3), dtype=np.uint8)
            fmt = fmts[k % len(fmts)]
            ext = ".jpg" if fmt == "JPEG" else ".png"
            Image.fromarray(img).save(os.path.join(d, f"im{i}{ext}"), format=fmt)
            k += 1


def test_iter_canonical_native_matches_pil_order_and_labels(tmp_path):
    from rlcf_tpu.data.datasets import ImageFolderDataset, iter_canonical

    _make_image_folder(str(tmp_path))
    ds = ImageFolderDataset(str(tmp_path))
    pil = list(iter_canonical(ds, 64, seed=3, decode="pil"))
    nat = list(iter_canonical(ds, 64, seed=3, decode="native", workers=3))
    assert [l for _, l in pil] == [l for _, l in nat]
    for (a, _), (b, _) in zip(pil, nat):
        assert a.shape == b.shape == (64, 64, 3)
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.mean() < 1.0


def test_iter_batches_native_matches_pil(tmp_path):
    from rlcf_tpu.data.datasets import ImageFolderDataset, iter_batches

    _make_image_folder(str(tmp_path), n_per_class=2)
    ds = ImageFolderDataset(str(tmp_path))
    pil = list(iter_batches(ds, batch_size=3, resolution=48, seed=1))
    nat = list(iter_batches(ds, batch_size=3, resolution=48, seed=1, decode="native", workers=2))
    assert len(pil) == len(nat)
    for (ia, la), (ib, lb) in zip(pil, nat):
        np.testing.assert_array_equal(la, lb)
        # float CLIP-normalized space: 1 gray ~ 0.015; mean within that
        assert np.abs(ia - ib).mean() < 0.015


def test_preprocess_native_matches_pil(tmp_path):
    from rlcf_tpu.data.transforms import preprocess, preprocess_many, preprocess_pil

    img = _rand_img(90, 120, seed=7)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    ref = preprocess_pil(p, 64)
    nat = preprocess(p, 64, decode="native")
    assert nat.dtype == ref.dtype == np.float32
    assert np.abs(nat - ref).mean() < 0.015  # 1 gray ~ 0.015 normalized

    # arrays and non-image paths fall back to PIL identically
    np.testing.assert_array_equal(preprocess(img, 64, decode="native"), preprocess_pil(img, 64))

    outs = preprocess_many([p, img, p], 64, decode="native", workers=2)
    assert len(outs) == 3 and all(o.shape == (64, 64, 3) for o in outs)
    np.testing.assert_array_equal(outs[0], outs[2])


def test_iter_canonical_falls_back_without_sample_ref():
    from rlcf_tpu.data.datasets import SyntheticDataset, iter_canonical

    ds = SyntheticDataset(n=5, size=96)
    out = list(iter_canonical(ds, 64, decode="native", workers=2))
    assert len(out) == 5 and out[0][0].shape == (64, 64, 3)


@pytest.mark.parametrize("cli,extra", [
    ("tta_cls", []),
    ("tune_cls", []),
    ("zero_shot", []),
    ("tta_retrieval", ["--annotations", "x.json", "--vis_root", "y"]),
    ("tta_caption", []),
    ("extract_features", ["--annotations", "x.json", "--out", "o.npz"]),
    ("clipscore_eval", ["c.json", "imgs"]),
])
def test_every_image_cli_exposes_decode_flags(cli, extra):
    import importlib

    mod = importlib.import_module(f"rlcf_tpu.cli.{cli}")
    args = mod.get_args(extra + ["--decode", "native", "--decode_workers", "3"])
    assert args.decode == "native" and args.decode_workers == 3


def test_decode_dims_refuses_bomb_headers():
    # decode_rgb_native sizes its buffer from rlcf_decode_dims — a bomb
    # header must fail there, before any allocation
    import struct
    import zlib

    data = bytearray(_encode(_rand_img(8, 8, seed=13), "PNG"))
    data[16:24] = struct.pack(">II", 60000, 60000)
    crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    assert native.decode_rgb_native(bytes(data)) is None
