"""Fused multi-head attention forward (Pallas, TPU) for the CLIP towers.

Motivation (measured, PERF.md round 3): in the 64-view policy encode the
T x T attention segment is 4% of the FLOPs but 37% of the runtime — the
dense path materializes the [B, H, T, T] fp32 score tensor (and its bf16
softmax) through HBM between the two attention matmuls (~150 MB/layer for
256 ViT-B/16 views). This kernel keeps scores/probs entirely in VMEM: one
grid step per batch image processes all heads with batched dot_generals and
an in-register fp32 softmax.

Numerics match the dense path: fp32 score accumulation, max-subtracted fp32
softmax, probs cast to the input dtype before the value matmul.

Differentiation: a custom VJP recomputes the backward densely from (q, k, v)
— correct everywhere (vmap/remat included), with the memory profile of
recomputation. The hot callers are forward-only (frozen towers), so the
backward is a safety net, not a hot path.

Sequence lengths are NOT required to be 128-multiples (CLIP uses T=197/257);
VMEM tiles pad internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_qkv_kernel(qkv_ref, o_ref, *, n_heads: int, head_dim: int, scale: float):
    """One batch image per grid step; heads split by static lane slices in
    VMEM (the XLA path's [B, H, T, D] split/merge transposes are full HBM
    relayouts — 4 x ~19 MB per ViT-B layer at 256 views)."""
    qkv = qkv_ref[0]  # [T, 3*H*D]
    HD = n_heads * head_dim
    for h in range(n_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, HD + h * head_dim: HD + (h + 1) * head_dim]
        v = qkv[:, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                         # [T, T] fp32, VMEM-resident
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = o.astype(o_ref.dtype)


def _mha_fwd_pallas(qkv, n_heads: int, scale: float, interpret: bool):
    B, T, threeHD = qkv.shape
    HD = threeHD // 3
    return pl.pallas_call(
        functools.partial(_mha_qkv_kernel, n_heads=n_heads, head_dim=HD // n_heads, scale=scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, threeHD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _dense_reference(qkv, n_heads: int, scale: float):
    """The dense math (mirrors layers.multi_head_attention's unmasked path)."""
    B, T, threeHD = qkv.shape
    D = threeHD // 3 // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(B, T, n_heads, D).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, T, n_heads * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_attention(qkv, n_heads: int, scale: float, interpret: bool = False):
    """Unmasked MHA from the fused projection: [B, T, 3·H·D] -> [B, T, H·D]."""
    return _mha_fwd_pallas(qkv, n_heads, scale, interpret)


def _fwd(qkv, n_heads, scale, interpret):
    return _mha_fwd_pallas(qkv, n_heads, scale, interpret), (qkv,)


def _bwd(n_heads, scale, interpret, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _dense_reference(t, n_heads, scale), qkv)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def fused_attention_available() -> bool:
    return jax.default_backend() == "tpu"
