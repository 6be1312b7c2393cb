"""OPT decode-phase microbench: per-token cost decomposition.

Isolates the caption-TTA decode costs that PERF records aggregate
(`tasks/caption.py` beam decode = the 2.0%-MFU round-3 bottleneck,
VERDICT r3 weak #1):

  prefill_ms        one prefix forward building the shared prefix cache
                    (B prefixes — NOT B*beams; see models/opt.py::_prefill)
  decode_ms_per_tok one cached decode step serving B*K sequences
  reorder_ms        gather of the per-beam generated cache only (the shared
                    prefix cache is never reordered)
  beam_ms_per_tok   full beam_generate cost / emitted tokens (top-k, masks,
                    softmax included)

Run: python tools/bench_decode.py [--model opt-125m] [--group 8] [--beams 6]
     [--prefix 40] [--new 50] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="opt-125m")
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--beams", type=int, default=6)
    ap.add_argument("--prefix", type=int, default=40)
    ap.add_argument("--new", type=int, default=50)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"],
                    help="f32 for CPU smoke runs (CPU XLA lacks bf16 dots)")
    ap.add_argument("--quant", action="store_true",
                    help="int8 weight-only decode (quantize_opt_params)")
    args = ap.parse_args(argv)

    from rlcf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from rlcf_tpu.models import opt as O

    cfg = O.OPT_CONFIGS[args.model]
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = O.init_opt_params(jax.random.PRNGKey(0), cfg, dtype=dt)
    if args.quant:
        params = O.quantize_opt_params(params)
    B, K, P, G = args.group, args.beams, args.prefix, args.new
    N = B * K
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, P, cfg.embed_dim), dt) * 0.02

    def materialize(out):
        # On the axon tunnel jax.block_until_ready returns before the remote
        # computation finishes (r5 finding: a 200ms beam decode "timed" at
        # 0.1ms); fetching one element of an output buffer is the only
        # reliable completion barrier. 4-byte transfer, negligible.
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return out

    def timed(fn, *a, iters=args.iters):
        out = materialize(fn(*a))  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = materialize(fn(*a))
        return (time.perf_counter() - t0) / iters, out

    # 1. prefill (shared cache, B prefixes)
    prefill = jax.jit(lambda p, pe: O._prefill(p, cfg, pe))
    prefill_s, (logits0, prefix_cache) = timed(prefill, params, prefix)

    # 2. one decode step at a mid-sequence position
    gen_cache = O._init_gen_cache(cfg, N, G, prefix_cache[0].dtype)
    token = jnp.zeros((N,), jnp.int32)
    t_mid = jnp.int32(G // 2)
    dec = jax.jit(
        lambda p, tok, pc, gc, t: O._decode_step(p, cfg, tok, pc, gc, t, expand=K)
    )
    dec_s, (_, gen_cache) = timed(dec, params, token, prefix_cache, gen_cache, t_mid)

    # 3. gen-cache beam reorder (the only state beam search gathers)
    src = jnp.tile(jnp.arange(K)[::-1][None], (B, 1))  # worst-case permutation

    def reorder(gc, src_beam):
        def r(c):
            cL = c.reshape(c.shape[0], B, K, *c.shape[2:])
            cL = jnp.take_along_axis(cL, src_beam[None, :, :, None, None, None], axis=2)
            return cL.reshape(c.shape)

        return r(gc[0]), r(gc[1])

    reorder_j = jax.jit(reorder)
    reorder_s, _ = timed(reorder_j, gen_cache, src)

    # 4. whole beam search per emitted token (random weights rarely emit EOS,
    # so the early exit does not fire: tokens == G)
    beam = jax.jit(
        lambda p, pe: O.beam_generate(p, cfg, pe, num_beams=K, max_new_tokens=G, num_return=K)
    )
    beam_s, _ = timed(beam, params, prefix, iters=max(3, args.iters // 4))

    # segment-bucketed gen cache (seg_len=16): reorder/attn traffic scales
    # with elapsed tokens — identical outputs, A/B the wall clock
    beam_seg = jax.jit(
        lambda p, pe: O.beam_generate(p, cfg, pe, num_beams=K, max_new_tokens=G, num_return=K, seg_len=16)
    )
    beam_seg_s, _ = timed(beam_seg, params, prefix, iters=max(3, args.iters // 4))

    # actual weight-stream bytes (int8 leaves count 1 byte under --quant)
    bytes_per_step = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    out = {
        "model": args.model,
        "shapes": {"group": B, "beams": K, "prefix": P, "max_new": G, "seqs": N},
        "prefill_ms": round(prefill_s * 1e3, 2),
        "decode_ms_per_tok": round(dec_s * 1e3, 3),
        "reorder_ms": round(reorder_s * 1e3, 3),
        "beam_ms_per_tok": round(beam_s / G * 1e3, 3),
        "beam_total_ms": round(beam_s * 1e3, 1),
        "beam_seg16_total_ms": round(beam_seg_s * 1e3, 1),
        "weight_stream_mb_per_tok": round(bytes_per_step / 1e6, 1),
        "hbm_bound_ms_per_tok_at_819GBps": round(bytes_per_step / 819e9 * 1e3, 3),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
