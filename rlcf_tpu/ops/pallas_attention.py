"""Fused multi-head attention (Pallas, TPU) for the CLIP towers — fwd + bwd.

Motivation (measured, PERF.md round 3): in the 64-view policy encode the
T x T attention segment is 4% of the FLOPs but 37% of the runtime — the
dense path materializes the [B, H, T, T] fp32 score tensor (and its bf16
softmax, and four [B, H, T, D] head split/merge relayouts) through HBM
between the two attention matmuls. The text tower is worse in relative
terms: at T~16 the attention FLOPs are negligible but the fixed per-layer
relayout/softmax traffic still dominates its runtime.

Both kernels consume the UNSPLIT qkv projection [B, T, 3·H·D] and touch
heads only as static lane slices in VMEM; scores/probs live and die
on-chip. The backward recomputes probs from qkv (flash-attention style) and
emits dqkv in the same fused layout, so fwd+bwd through a differentiated
text tower never materializes a head-major tensor in HBM either.

Numerics match the dense path: fp32 score accumulation, max-subtracted fp32
softmax (with optional additive mask — the CLIP causal text mask), probs
cast to the input dtype before the value matmul; backward is the exact
softmax/bilinear adjoint in fp32.

Sequence lengths are NOT required to be 128-multiples (CLIP uses 16-257).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e9  # finite stand-in for the causal mask's -inf (kernel-safe)


def _head_slices(qkv, h: int, head_dim: int, HD: int):
    q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
    k = qkv[:, :, HD + h * head_dim: HD + (h + 1) * head_dim]
    v = qkv[:, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim]
    return q, k, v  # each [G, T, D]


def _bdot(a, b, contract_a: int, contract_b: int):
    """Batched (over dim 0) matmul contracting the given dims, fp32 accum."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _scores(q, k, mask, scale: float):
    s = _bdot(q, k, 2, 2) * scale  # [G, T, T]
    if mask is not None:
        s = s + mask[None]
    return s


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _mha_fwd_kernel(qkv_ref, *rest, n_heads: int, head_dim: int, scale: float, masked: bool):
    if masked:
        mask_ref, o_ref = rest
        mask = mask_ref[:]
    else:
        (o_ref,) = rest
        mask = None
    qkv = qkv_ref[:]  # [G, T, 3*H*D] — G sequences per grid step
    HD = n_heads * head_dim
    G = qkv.shape[0]
    # stack heads along the batch dim so the whole step is ONE batched
    # dot_general pair (the MXU pipelines across batch; H separate
    # [T,D]x[D,T] matmuls serialize)
    q3 = jnp.concatenate([qkv[:, :, h * head_dim:(h + 1) * head_dim] for h in range(n_heads)], axis=0)
    k3 = jnp.concatenate(
        [qkv[:, :, HD + h * head_dim: HD + (h + 1) * head_dim] for h in range(n_heads)], axis=0)
    v3 = jnp.concatenate(
        [qkv[:, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim] for h in range(n_heads)], axis=0)
    p = _softmax(_scores(q3, k3, mask, scale))   # [H*G, T, T]
    o = _bdot(p.astype(v3.dtype), v3, 2, 1)      # [H*G, T, D]
    for h in range(n_heads):
        o_ref[:, :, h * head_dim:(h + 1) * head_dim] = o[h * G:(h + 1) * G].astype(o_ref.dtype)


def _mha_bwd_kernel(qkv_ref, g_ref, *rest, n_heads: int, head_dim: int, scale: float, masked: bool):
    """dqkv from (qkv, g): recompute probs per head in VMEM (flash-style)."""
    if masked:
        mask_ref, dqkv_ref = rest
        mask = mask_ref[:]
    else:
        (dqkv_ref,) = rest
        mask = None
    qkv = qkv_ref[:]  # [G, T, 3*H*D]
    g = g_ref[:]      # [G, T, H*D]
    HD = n_heads * head_dim
    G = qkv.shape[0]
    f32 = jnp.float32
    # heads stacked along batch (see the forward kernel): five batched
    # dot_generals for the whole step instead of 5 x H serialized small ones
    q3 = jnp.concatenate([qkv[:, :, h * head_dim:(h + 1) * head_dim] for h in range(n_heads)], axis=0)
    k3 = jnp.concatenate(
        [qkv[:, :, HD + h * head_dim: HD + (h + 1) * head_dim] for h in range(n_heads)], axis=0)
    v3 = jnp.concatenate(
        [qkv[:, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim] for h in range(n_heads)], axis=0)
    g3 = jnp.concatenate(
        [g[:, :, h * head_dim:(h + 1) * head_dim] for h in range(n_heads)], axis=0).astype(f32)
    p = _softmax(_scores(q3, k3, mask, scale))            # [H*G, T, T] f32
    # dv = p^T g ; dp = g v^T ; ds = p*(dp - rowsum(dp*p)) ; dq = ds k ; dk = ds^T q
    dv = _bdot(p, g3, 1, 1)
    dp = _bdot(g3, v3.astype(f32), 2, 2)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = _bdot(ds, k3.astype(f32), 2, 1) * scale
    dk = _bdot(ds, q3.astype(f32), 1, 1) * scale
    dt = dqkv_ref.dtype
    for h in range(n_heads):
        sl = slice(h * G, (h + 1) * G)
        dqkv_ref[:, :, h * head_dim:(h + 1) * head_dim] = dq[sl].astype(dt)
        dqkv_ref[:, :, HD + h * head_dim: HD + (h + 1) * head_dim] = dk[sl].astype(dt)
        dqkv_ref[:, :, 2 * HD + h * head_dim: 2 * HD + (h + 1) * head_dim] = dv[sl].astype(dt)


def _seqs_per_step(B: int, T: int, threeHD: int) -> int:
    """Sequences per grid step: enough per-step work to amortize grid
    overhead (T~16 towers need tens of seqs/step; T=197+ towers take 1),
    bounded by VMEM — the bwd holds qkv + dqkv blocks (2 x G·T·3HD bf16)
    plus per-head [G, T, T] fp32 scores — and by divisibility of B."""
    budget = 2 * 1024 * 1024  # bytes for the qkv block (x2 with dqkv ~ 4 MB)
    g = min(B, max(1, budget // (T * threeHD * 2)), max(1, 65536 // (T * T)))
    while B % g:
        g -= 1
    return max(g, 1)


def _call(kernel, qkv, extra_arrays, out_shape, interpret: bool, G: int):
    B, T, threeHD = qkv.shape
    specs = [pl.BlockSpec((G, T, threeHD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    args = [qkv]
    for arr in extra_arrays:
        if arr.ndim == 3:  # per-batch tensor (cotangent)
            specs.append(pl.BlockSpec((G,) + arr.shape[1:], lambda b: (b, 0, 0), memory_space=pltpu.VMEM))
        else:  # shared [T, T] mask
            specs.append(pl.BlockSpec(arr.shape, lambda b: (0, 0), memory_space=pltpu.VMEM))
        args.append(arr)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=specs,
        out_specs=pl.BlockSpec((G,) + out_shape[1:], lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, qkv.dtype),
        interpret=interpret,
        # the stacked-head bwd holds ~3 x [H*G, T, T] fp32 score tensors; at
        # ViT-L shapes that exceeds the 16 MB default scoped limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _prep_mask(mask):
    """Clamp -inf to a finite floor (exp under the kernel handles it exactly
    like the dense path after max-subtraction)."""
    return jnp.maximum(mask.astype(jnp.float32), _NEG_BIG)


def _mha_fwd_pallas(qkv, mask, n_heads: int, scale: float, interpret: bool):
    B, T, threeHD = qkv.shape
    HD = threeHD // 3
    kern = functools.partial(_mha_fwd_kernel, n_heads=n_heads, head_dim=HD // n_heads,
                             scale=scale, masked=mask is not None)
    extra = [] if mask is None else [_prep_mask(mask)]
    return _call(kern, qkv, extra, (B, T, HD), interpret, _seqs_per_step(B, T, threeHD))


def _mha_bwd_pallas(qkv, g, mask, n_heads: int, scale: float, interpret: bool):
    B, T, threeHD = qkv.shape
    HD = threeHD // 3
    kern = functools.partial(_mha_bwd_kernel, n_heads=n_heads, head_dim=HD // n_heads,
                             scale=scale, masked=mask is not None)
    extra = [g] if mask is None else [g, _prep_mask(mask)]
    return _call(kern, qkv, extra, (B, T, threeHD), interpret, _seqs_per_step(B, T, threeHD))


def _dense_reference(qkv, n_heads: int, scale: float, mask=None):
    """The dense math (mirrors layers.multi_head_attention)."""
    B, T, threeHD = qkv.shape
    D = threeHD // 3 // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(B, T, n_heads, D).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, T, n_heads * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention(qkv, mask, n_heads: int, scale: float, interpret: bool = False):
    """MHA from the fused projection: [B, T, 3·H·D] (+ optional additive
    [T, T] mask) -> [B, T, H·D]."""
    return _mha_fwd_pallas(qkv, mask, n_heads, scale, interpret)


def _fwd(qkv, mask, n_heads, scale, interpret):
    return _mha_fwd_pallas(qkv, mask, n_heads, scale, interpret), (qkv, mask)


def _bwd(n_heads, scale, interpret, res, g):
    qkv, mask = res
    dqkv = _mha_bwd_pallas(qkv, g, mask, n_heads, scale, interpret)
    return dqkv, None


fused_attention.defvjp(_fwd, _bwd)


def fused_attention_available() -> bool:
    return jax.default_backend() == "tpu"
