"""Image preprocessing: CLIP eval transform on host (PIL) and on device (JAX).

The reference eval pipeline is Resize(bicubic, short side) -> CenterCrop ->
ToTensor -> Normalize with the CLIP statistics (`TPT/tpt_cls_rl.py:132-158`).
Two implementations:

- ``load_image`` / ``preprocess_pil``: host-side PIL path for reading real
  datasets (1 CPU core on this host — keep it to decode + resize only).
- ``preprocess_device``: jit-able path for uint8 HWC device arrays, used by the
  TPU-native augmentation pipeline (bicubic resize via jax.image).
"""

from __future__ import annotations

import os

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 HWC RGB."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_short_side_pil(img: np.ndarray, size: int) -> np.ndarray:
    """Bicubic resize so the short side equals ``size`` (host, PIL)."""
    from PIL import Image

    h, w = img.shape[:2]
    if h < w:
        new_h, new_w = size, max(size, int(round(w * size / h)))
    else:
        new_h, new_w = max(size, int(round(h * size / w))), size
    return np.asarray(Image.fromarray(img).resize((new_w, new_h), Image.BICUBIC))


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> normalized float32 HWC."""
    return (img.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def preprocess_pil(path_or_array, resolution: int = 224) -> np.ndarray:
    """Full CLIP eval transform on host -> float32 [resolution, resolution, 3]."""
    img = path_or_array if isinstance(path_or_array, np.ndarray) else load_image(path_or_array)
    img = resize_short_side_pil(img, resolution)
    img = center_crop(img, resolution)
    return normalize(img)


def load_canonical(path: str, size: int):
    """Native file-bytes -> canonical [size, size, 3] u8 square, or None.

    The single native-decode gate shared by `preprocess` and
    `datasets.iter_canonical`: JPEG/PNG extension whitelist, one
    GIL-releasing C++ call (decode bit-identical to PIL; bicubic resize
    within tolerance — `native/rlcf_host.cpp::rlcf_load_canonical`). Returns
    None whenever the caller should take its PIL path instead (other
    formats, codec-free build, corrupt/oversized files).
    """
    if not (isinstance(path, str) and path.lower().endswith((".jpg", ".jpeg", ".png"))):
        return None
    try:
        from .native import decode_available, load_canonical_native

        if not decode_available():
            return None
        with open(path, "rb") as fh:
            return load_canonical_native(fh.read(), size)
    except Exception:
        return None


def preprocess(path_or_array, resolution: int = 224, decode: str = "pil") -> np.ndarray:
    """`preprocess_pil` with an optional native decode+resize fast path
    (``decode="native"`` -> `load_canonical`, PIL fallback otherwise)."""
    if decode == "native":
        arr = load_canonical(path_or_array, resolution)
        if arr is not None:
            return normalize(arr)
    return preprocess_pil(path_or_array, resolution)


def preprocess_many(items, resolution: int = 224, decode: str = "pil", workers: int = 0):
    """Preprocess a list of paths/arrays, threading the native decode path.

    The native call releases the GIL, so a thread pool gets real decode
    parallelism (the reference's DataLoader-worker role). Order preserved.
    """
    items = list(items)
    if decode == "native":
        # Resolve (and if needed build) the native library ONCE before any
        # pool: concurrent first-use builds from worker threads could race
        # on the .so file.
        try:
            from .native import decode_available

            if not decode_available():
                decode = "pil"
        except Exception:
            decode = "pil"
    if decode != "native" or len(items) <= 1:
        return [preprocess(i, resolution, decode) for i in items]
    if workers == 0:
        workers = min(8, os.cpu_count() or 1)
    if workers <= 1:
        return [preprocess(i, resolution, "native") for i in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, len(items))) as ex:
        return list(ex.map(lambda i: preprocess(i, resolution, "native"), items))


def preprocess_device(img, resolution: int = 224):
    """Device-side eval transform for uint8/float HWC arrays (jit-able).

    Bicubic short-side resize + center crop + CLIP normalization.
    """
    import jax.image
    import jax.numpy as jnp

    img = img.astype(jnp.float32) / 255.0 if img.dtype == jnp.uint8 else img.astype(jnp.float32)
    h, w = img.shape[0], img.shape[1]
    if h < w:
        new_h, new_w = resolution, int(round(w * resolution / h))
    else:
        new_h, new_w = int(round(h * resolution / w)), resolution
    img = jax.image.resize(img, (new_h, new_w, 3), method="bicubic")
    top = (new_h - resolution) // 2
    left = (new_w - resolution) // 2
    img = jax.lax.dynamic_slice(img, (top, left, 0), (resolution, resolution, 3))
    return (img - CLIP_MEAN) / CLIP_STD
