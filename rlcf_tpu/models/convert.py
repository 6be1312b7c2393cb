"""Torch checkpoint -> JAX pytree converters.

``convert_clip_state_dict`` ingests an OpenAI CLIP state dict (the layout that
``build_model`` consumes, `TPT/clip/model.py:399-438`) and emits the param
pytree used by :mod:`rlcf_tpu.models.clip`. Weight-layout changes:

- torch Linear weights are [out, in]; ours are [in, out] (transposed).
- attention in_proj (q;k;v stacked rows) becomes a fused [D, 3D] ``qkv_w``.
- convs go OIHW -> HWIO (NHWC kernels).
- per-layer transformer tensors are stacked along a leading layer axis for
  ``lax.scan`` traversal.

Also provides loaders for checkpoints saved by torch (``load_torch_file``),
used for OpenAI .pt archives, CoOp prompt checkpoints, and CapDec/ClipCap
mapper checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .clip import ClipConfig, infer_arch_from_state_dict


def _np(t, dtype=None):
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype.is_floating_point and t.dtype not in (None,):
            t = t.float()
        t = t.numpy()
    arr = np.asarray(t)
    if dtype is not None and np.issubdtype(arr.dtype, np.floating):
        arr = arr.astype(dtype)
    return arr


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (eager or TorchScript archive) as numpy arrays."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "shape")}


def _stack_transformer_blocks(sd, prefix: str, n_layers: int, dtype):
    """Stack ``{prefix}.resblocks.{i}.*`` tensors into scan-ready arrays."""
    get = lambda i, name: _np(sd[f"{prefix}.resblocks.{i}.{name}"], dtype)
    stack = lambda name, transform=lambda x: x: jnp.asarray(
        np.stack([transform(get(i, name)) for i in range(n_layers)])
    )
    T = np.transpose
    return {
        "ln1_w": stack("ln_1.weight"),
        "ln1_b": stack("ln_1.bias"),
        "qkv_w": stack("attn.in_proj_weight", T),
        "qkv_b": stack("attn.in_proj_bias"),
        "out_w": stack("attn.out_proj.weight", T),
        "out_b": stack("attn.out_proj.bias"),
        "ln2_w": stack("ln_2.weight"),
        "ln2_b": stack("ln_2.bias"),
        "fc_w": stack("mlp.c_fc.weight", T),
        "fc_b": stack("mlp.c_fc.bias"),
        "proj_w": stack("mlp.c_proj.weight", T),
        "proj_b": stack("mlp.c_proj.bias"),
    }


def _conv_hwio(w):
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _bn(sd, prefix, dtype):
    return {
        "w": jnp.asarray(_np(sd[f"{prefix}.weight"], dtype)),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"], dtype)),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"], np.float32)),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"], np.float32)),
    }


def _convert_vit_visual(sd, cfg: ClipConfig, dtype):
    return {
        "conv_w": _conv_hwio(_np(sd["visual.conv1.weight"], dtype)),
        "class_emb": jnp.asarray(_np(sd["visual.class_embedding"], dtype)),
        "pos_emb": jnp.asarray(_np(sd["visual.positional_embedding"], dtype)),
        "ln_pre_w": jnp.asarray(_np(sd["visual.ln_pre.weight"], dtype)),
        "ln_pre_b": jnp.asarray(_np(sd["visual.ln_pre.bias"], dtype)),
        "blocks": _stack_transformer_blocks(sd, "visual.transformer", cfg.vision_layers, dtype),
        "ln_post_w": jnp.asarray(_np(sd["visual.ln_post.weight"], dtype)),
        "ln_post_b": jnp.asarray(_np(sd["visual.ln_post.bias"], dtype)),
        "proj": jnp.asarray(_np(sd["visual.proj"], dtype)),
    }


def _convert_resnet_visual(sd, cfg: ClipConfig, dtype):
    stem = {
        "conv1_w": _conv_hwio(_np(sd["visual.conv1.weight"], dtype)),
        "bn1": _bn(sd, "visual.bn1", dtype),
        "conv2_w": _conv_hwio(_np(sd["visual.conv2.weight"], dtype)),
        "bn2": _bn(sd, "visual.bn2", dtype),
        "conv3_w": _conv_hwio(_np(sd["visual.conv3.weight"], dtype)),
        "bn3": _bn(sd, "visual.bn3", dtype),
    }
    groups = []
    for g, n_blocks in enumerate(cfg.vision_layers, start=1):
        blocks = []
        for b in range(n_blocks):
            pre = f"visual.layer{g}.{b}"
            block = {
                "conv1_w": _conv_hwio(_np(sd[f"{pre}.conv1.weight"], dtype)),
                "bn1": _bn(sd, f"{pre}.bn1", dtype),
                "conv2_w": _conv_hwio(_np(sd[f"{pre}.conv2.weight"], dtype)),
                "bn2": _bn(sd, f"{pre}.bn2", dtype),
                "conv3_w": _conv_hwio(_np(sd[f"{pre}.conv3.weight"], dtype)),
                "bn3": _bn(sd, f"{pre}.bn3", dtype),
            }
            if f"{pre}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv_w": _conv_hwio(_np(sd[f"{pre}.downsample.0.weight"], dtype)),
                    "bn": _bn(sd, f"{pre}.downsample.1", dtype),
                }
            blocks.append(block)
        groups.append(blocks)
    ap = "visual.attnpool"
    T = np.transpose
    attnpool = {
        "pos_emb": jnp.asarray(_np(sd[f"{ap}.positional_embedding"], dtype)),
        "q_w": jnp.asarray(T(_np(sd[f"{ap}.q_proj.weight"], dtype))),
        "q_b": jnp.asarray(_np(sd[f"{ap}.q_proj.bias"], dtype)),
        "k_w": jnp.asarray(T(_np(sd[f"{ap}.k_proj.weight"], dtype))),
        "k_b": jnp.asarray(_np(sd[f"{ap}.k_proj.bias"], dtype)),
        "v_w": jnp.asarray(T(_np(sd[f"{ap}.v_proj.weight"], dtype))),
        "v_b": jnp.asarray(_np(sd[f"{ap}.v_proj.bias"], dtype)),
        "c_w": jnp.asarray(T(_np(sd[f"{ap}.c_proj.weight"], dtype))),
        "c_b": jnp.asarray(_np(sd[f"{ap}.c_proj.bias"], dtype)),
    }
    return {"stem": stem, "groups": groups, "attnpool": attnpool}


def convert_clip_state_dict(sd: Dict, dtype=np.float32):
    """Convert a torch CLIP state dict -> (params pytree, inferred ClipConfig)."""
    sd = {k: v for k, v in sd.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    shapes = {k: tuple(v.shape) for k, v in sd.items()}
    cfg = infer_arch_from_state_dict(shapes)
    visual = _convert_vit_visual(sd, cfg, dtype) if cfg.is_vit else _convert_resnet_visual(sd, cfg, dtype)
    params = {
        "visual": visual,
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"], dtype)),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"], dtype)),
            "blocks": _stack_transformer_blocks(sd, "transformer", cfg.text_layers, dtype),
            "ln_final_w": jnp.asarray(_np(sd["ln_final.weight"], dtype)),
            "ln_final_b": jnp.asarray(_np(sd["ln_final.bias"], dtype)),
            "projection": jnp.asarray(_np(sd["text_projection"], dtype)),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"], np.float32)),
    }
    return params, cfg


# SHA256 digests of the released OpenAI checkpoints (from the download URLs
# the reference verifies, `TPT/clip/clip.py:30-70`).
CLIP_CHECKPOINT_SHA256 = {
    "RN50": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101": "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4": "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "RN50x16": "52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa",
    "RN50x64": "be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c",
    "ViT-B/32": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
    "ViT-B/16": "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
    "ViT-L/14": "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836",
    "ViT-L/14@336px": "3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02",
}


def _sha256_file(path: str) -> str:
    """Chunked SHA256 (checkpoints are ~100 MB-1.7 GB; never read them whole).

    The digest is memoized in a ``<path>.sha256`` sidecar keyed by
    (size, mtime_ns): hashing a 1.7 GB ViT-L/14 file adds multi-second startup
    latency to every CLI invocation otherwise. A touched/replaced file misses
    the key and re-hashes; an unwritable directory silently skips the cache.
    """
    import hashlib
    import json

    st = os.stat(path)
    sidecar = path + ".sha256"
    try:
        with open(sidecar) as fh:
            cached = json.load(fh)
        if cached.get("size") == st.st_size and cached.get("mtime_ns") == st.st_mtime_ns:
            return cached["sha256"]
    except (OSError, ValueError, KeyError):
        pass

    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    try:
        with open(sidecar, "w") as fh:
            json.dump({"size": st.st_size, "mtime_ns": st.st_mtime_ns, "sha256": digest}, fh)
    except OSError:
        pass
    return digest


def verify_checkpoint_sha256(path: str, arch: Optional[str] = None) -> bool:
    """Verify a local OpenAI CLIP .pt against the published digest."""
    digest = _sha256_file(path)
    if arch is not None:
        return digest == CLIP_CHECKPOINT_SHA256.get(arch)
    return digest in CLIP_CHECKPOINT_SHA256.values()


def check_checkpoint_digest(path: str, arch: str):
    """Classify a checkpoint file's SHA256 for ``arch``.

    Returns (status, digest) with status one of:
      - ``"ok"``: matches the published digest for ``arch``;
      - ``"wrong-arch"``: matches a *different* stock release (the user
        grabbed the wrong file — loading it would silently build the wrong
        tower);
      - ``"unknown"``: not a stock digest (fine-tuned/converted file; no
        integrity claim can be made).

    Parity target: the reference re-verifies cached downloads and refuses
    mismatches (`TPT/clip/clip.py:53-70`).
    """
    digest = _sha256_file(path)
    if digest == CLIP_CHECKPOINT_SHA256.get(arch):
        return "ok", digest
    for other, d in CLIP_CHECKPOINT_SHA256.items():
        if digest == d:
            return "wrong-arch", other
    return "unknown", digest


def load_clip_checkpoint(path: str, dtype=np.float32, verify_arch: Optional[str] = None):
    """Load an OpenAI CLIP .pt checkpoint into (params, config).

    ``verify_arch``: optionally check the file's SHA256 against the published
    digest for that architecture (parity with `TPT/clip/clip.py:53-70`).
    """
    if verify_arch is not None and not verify_checkpoint_sha256(path, verify_arch):
        raise RuntimeError(f"{path} does not match the published SHA256 for {verify_arch}")
    return convert_clip_state_dict(load_torch_file(path), dtype=dtype)


# OpenAI's public checkpoint host; URLs embed the SHA256 so the digest table
# above is also the URL table (`TPT/clip/clip.py:29-40`).
_CLIP_URL_HOST = "https://openaipublic.azureedge.net/clip/models"


def clip_checkpoint_url(arch: str) -> str:
    """Download URL for a released OpenAI CLIP arch (digest-addressed)."""
    if arch not in CLIP_CHECKPOINT_SHA256:
        raise ValueError(f"no released OpenAI checkpoint for {arch!r}; "
                         f"known: {sorted(CLIP_CHECKPOINT_SHA256)}")
    fname = arch.replace("/", "-").replace("@", "-") + ".pt"
    return f"{_CLIP_URL_HOST}/{CLIP_CHECKPOINT_SHA256[arch]}/{fname}"


def default_download_root() -> str:
    return os.environ.get(
        "RLCF_CHECKPOINT_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rlcf_tpu", "clip"),
    )


def download_checkpoint(arch: str, root: Optional[str] = None, timeout: float = 30.0) -> str:
    """Fetch + SHA256-verify a released OpenAI CLIP checkpoint.

    Parity with the reference's ``_download`` (`TPT/clip/clip.py:42-70`): an
    existing file with the right digest is reused; a wrong digest triggers a
    re-download; the fresh download is verified before being trusted.
    Egress-gated — environments without network get a clear error naming the
    file to fetch manually (RUNBOOK step 2) instead of a hung socket.
    """
    import urllib.error
    import urllib.request

    root = root or default_download_root()
    os.makedirs(root, exist_ok=True)
    url = clip_checkpoint_url(arch)
    target = os.path.join(root, os.path.basename(url))
    expected = CLIP_CHECKPOINT_SHA256[arch]

    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if _sha256_file(target) == expected:
            return target
        import warnings

        warnings.warn(f"{target} exists but its SHA256 does not match; re-downloading")

    # pid-suffixed temp + atomic replace: concurrent downloaders (e.g. a
    # policy and a reward job racing on the same arch) each write their own
    # file and the last os.replace wins intact
    tmp = f"{target}.part.{os.getpid()}"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as src, open(tmp, "wb") as out:
            while True:
                buf = src.read(1 << 20)
                if not buf:
                    break
                out.write(buf)
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise RuntimeError(
            f"cannot download {arch} checkpoint (no network egress?): {e}\n"
            f"Fetch {url} manually and pass it via --clip_checkpoint / "
            f"--reward_checkpoint, or place it at {target}"
        ) from e
    if _sha256_file(tmp) != expected:
        for f in (tmp, tmp + ".sha256"):
            try:
                os.unlink(f)
            except OSError:
                pass
        raise RuntimeError(f"downloaded {arch} checkpoint failed SHA256 verification")
    os.replace(tmp, target)
    try:  # drop the temp digest sidecar; memoize under the final name
        os.unlink(tmp + ".sha256")
    except OSError:
        pass
    _sha256_file(target)
    return target
