"""ctypes bindings for the native host image pipeline (native/rlcf_host.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes batch view generation / eval preprocessing with a thread pool. Falls
back cleanly (ImportError-style RuntimeError) when no toolchain exists; the
JAX device pipeline (`rlcf_tpu/data/augment.py`) is the default path anyway.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librlcf_host.so")
_BUILD_LOCK = threading.Lock()  # lru_cache does not serialize the first call


def _build():
    src = os.path.join(_NATIVE_DIR, "rlcf_host.cpp")
    if not os.path.exists(src):
        raise RuntimeError(f"native source not found at {src}")
    # Compile to a temp path and atomically rename: concurrent builders (other
    # threads or processes) then can't interleave writes into the loaded .so.
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    base = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-pthread"]
    # Preferred build includes the JPEG/PNG decode path; hosts without the
    # codec dev headers get the codec-free library (decode falls back to PIL).
    try:
        with_codecs = base + ["-DRLCF_WITH_CODECS", "-o", tmp, src, "-ljpeg", "-lpng"]
        try:
            subprocess.run(with_codecs, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            subprocess.run(base + ["-o", tmp, src], check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@functools.lru_cache()
def _lib():
    with _BUILD_LOCK:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "rlcf_host.cpp")
        ):
            _build()
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rlcf_generate_views_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_uint64, f32p, ctypes.c_int,
    ]
    lib.rlcf_generate_views_batch_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_uint64, u8p, ctypes.c_int,
    ]
    lib.rlcf_generate_views_batch_patch_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ctypes.c_int, u8p, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.rlcf_generate_views_batch_patch_u8.restype = ctypes.c_int
    lib.rlcf_preprocess_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
    ]
    lib.rlcf_native_version.restype = ctypes.c_int
    if hasattr(lib, "rlcf_load_canonical"):
        intp = ctypes.POINTER(ctypes.c_int)
        lib.rlcf_decode_dims.argtypes = [ctypes.c_char_p, ctypes.c_long, intp, intp]
        lib.rlcf_decode_dims.restype = ctypes.c_int
        lib.rlcf_decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_long, u8p]
        lib.rlcf_decode_rgb.restype = ctypes.c_int
        lib.rlcf_load_canonical.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int, u8p]
        lib.rlcf_load_canonical.restype = ctypes.c_int
    return lib


def available() -> bool:
    try:
        return _lib().rlcf_native_version() >= 1
    except Exception:
        return False


def generate_views_native(
    images: np.ndarray,
    n_views: int,
    resolution: int = 224,
    augmix: bool = True,
    severity: float = 1.0,
    crop_min: float = 0.08,
    seed: int = 0,
    n_threads: int = 0,
) -> np.ndarray:
    """[N, H, W, 3] u8 -> [N, n_views, R, R, 3] f32 normalized views."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, _ = images.shape
    out = np.empty((n, n_views, resolution, resolution, 3), np.float32)
    _lib().rlcf_generate_views_batch(
        images, n, h, w, n_views, resolution, int(augmix), float(severity), float(crop_min),
        np.uint64(seed), out, n_threads,
    )
    return out


def generate_views_native_u8(
    images: np.ndarray,
    n_views: int,
    resolution: int = 224,
    augmix: bool = True,
    severity: float = 1.0,
    crop_min: float = 0.08,
    seed: int = 0,
    n_threads: int = 0,
) -> np.ndarray:
    """[N, H, W, 3] u8 -> [N, n_views, R, R, 3] u8 RAW views (same RNG stream
    as ``generate_views_native``); normalize on device — 4x less host->device
    traffic, and the AugMix-mix quantization (<=0.5 gray level) is below the
    towers' bf16 input precision."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, _ = images.shape
    out = np.empty((n, n_views, resolution, resolution, 3), np.uint8)
    _lib().rlcf_generate_views_batch_u8(
        images, n, h, w, n_views, resolution, int(augmix), float(severity), float(crop_min),
        np.uint64(seed), out, n_threads,
    )
    return out


def generate_views_native_patch_u8(
    images: np.ndarray,
    n_views: int,
    p_policy: int,
    p_reward: int = 0,
    resolution: int = 224,
    augmix: bool = True,
    severity: float = 1.0,
    crop_min: float = 0.08,
    seed: int = 0,
    n_threads: int = 0,
):
    """[N, H, W, 3] u8 -> patch-major u8 token pair for the TPU hot path.

    Returns (policy_tokens [N, V, (R/p)^2, p^2*3], reward_tokens [N, V,
    (R/q)^2, q^2*3]) — the SAME views as ``generate_views_native_u8`` (one
    RNG stream), pre-patchified at the policy's and reward's patch sizes so
    device patch embedding is a single MXU matmul on a well-tiled layout
    (the [..., 3]-minor image layout tile-pads 42x on TPU).
    """
    if resolution % p_policy or (p_reward and resolution % p_reward):
        raise ValueError(
            f"patch sizes must tile the resolution exactly: {resolution} vs "
            f"policy {p_policy}" + (f", reward {p_reward}" if p_reward else "")
        )
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, _ = images.shape
    t1, d1 = (resolution // p_policy) ** 2, p_policy * p_policy * 3
    out1 = np.empty((n, n_views, t1, d1), np.uint8)
    if p_reward:
        t2, d2 = (resolution // p_reward) ** 2, p_reward * p_reward * 3
        out2 = np.empty((n, n_views, t2, d2), np.uint8)
    else:
        out2 = out1  # dummy buffer; p2=0 disables the second output in C++
    rc = _lib().rlcf_generate_views_batch_patch_u8(
        images, n, h, w, n_views, resolution, int(augmix), float(severity), float(crop_min),
        np.uint64(seed), p_policy, out1, p_reward, out2, n_threads,
    )
    if rc != 0:
        raise ValueError("native patch view generation rejected the patch/resolution combination")
    return (out1, out2) if p_reward else out1


def decode_available() -> bool:
    """True when the library was built with the JPEG/PNG codec path."""
    try:
        return hasattr(_lib(), "rlcf_load_canonical")
    except Exception:
        return False


def decode_rgb_native(data: bytes):
    """Decode JPEG/PNG bytes to a full-size uint8 HWC RGB array.

    Returns None when the container/colorspace is unsupported or the file is
    corrupt — the caller falls back to PIL (`transforms.load_image`).
    """
    lib = _lib()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.rlcf_decode_dims(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.rlcf_decode_rgb(data, len(data), out) != 0:
        return None
    return out


def load_canonical_native(data: bytes, size: int):
    """Decode + bicubic short-side resize + center crop -> [size, size, 3] u8.

    One native call for the episode stream's canonical source (what
    `load_image` + `resize_short_side_pil` + `center_crop` compose to); the
    ctypes call releases the GIL, so a Python thread pool gets real decode
    parallelism. Returns None on unsupported/corrupt input (caller falls back
    to the PIL path).
    """
    lib = _lib()
    out = np.empty((size, size, 3), np.uint8)
    if lib.rlcf_load_canonical(data, len(data), size, out) != 0:
        return None
    return out


def preprocess_native(images: np.ndarray, resolution: int = 224, n_threads: int = 0) -> np.ndarray:
    """Eval transform for a uint8 batch (short-side crop assumed square-ish)."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, _ = images.shape
    out = np.empty((n, resolution, resolution, 3), np.float32)
    _lib().rlcf_preprocess_batch(images, n, h, w, resolution, out, n_threads)
    return out
