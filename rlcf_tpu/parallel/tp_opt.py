"""Tensor-parallel OPT decode: shard the per-token weight stream over tp.

Cached decode streams every OPT weight once per token (`models/opt.py`
decode path) — on one chip that stream bounds caption-TTA generation. With a
(dp, tp) mesh, the standard Megatron split cuts the per-chip bytes/token by
tp: QKV and fc1 shard their OUTPUT features (heads split across chips), the
out/fc2 projections shard their INPUT features (XLA inserts the psum), and
the tied embedding/LM head shards the vocabulary (logits all-gather for
top-k is ~10 MB/token at OPT vocab — ICI noise next to the weight stream).

No shard_map needed: placing the params with these NamedShardings and
passing them as jit arguments lets GSPMD propagate head-sharded KV caches
and insert the collectives — the same annotate-and-let-XLA-partition recipe
as the rest of `parallel/` (SURVEY §2.5). Works for full-precision and
int8-quantized (`quantize_opt_params`) trees: the int8 payload and its
scales shard along the same axes.

The reference has no LLM tensor parallelism; this is a TPU-native serving
extension (`caption/image_llm/models/generate_opt.py` is single-GPU).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leading axis of every block array is the stacked layer index.
_BLOCK_SPECS = {
    # attention: shard heads (columns of the fused projections)
    "q_w": P(None, None, "tp"), "q_b": P(None, "tp"),
    "k_w": P(None, None, "tp"), "k_b": P(None, "tp"),
    "v_w": P(None, None, "tp"), "v_b": P(None, "tp"),
    # out proj contracts the sharded head dim -> psum; output replicated
    "out_w": P(None, "tp", None), "out_b": P(None),
    # MLP: fc1 shards its output, fc2 contracts it
    "fc1_w": P(None, None, "tp"), "fc1_b": P(None, "tp"),
    "fc2_w": P(None, "tp", None), "fc2_b": P(None),
    "ln1_w": P(None), "ln1_b": P(None),
    "ln2_w": P(None), "ln2_b": P(None),
}

_TOP_SPECS = {
    # tied embedding / LM head: vocab rows shard; the lookup gathers across
    # shards (tiny rows), the head's logits all-gather for top-k
    "embed_tokens": P("tp", None),
    "embed_positions": P(None),
    "final_ln_w": P(None), "final_ln_b": P(None),
    # OPT-350m projections: split like fc1/fc2
    "project_in": P(None, "tp"),
    "project_out": P("tp", None),
}


def _place(arr, mesh, spec, sc_axis="last"):
    """Place a weight (plain or int8 {"q8","sc"}).

    ``sc_axis``: which weight axis the quant scales follow — "last"
    (per-output-channel, the quantize_opt_params default) or "first"
    (embed_tokens' per-vocab-row scales)."""
    if isinstance(arr, dict):
        q8 = jax.device_put(arr["q8"], NamedSharding(mesh, spec))
        ax = spec[0] if sc_axis == "first" else spec[-1]
        sc_spec = P(*([None] * (arr["sc"].ndim - 1) + [ax]))
        return {"q8": q8, "sc": jax.device_put(arr["sc"], NamedSharding(mesh, sc_spec))}
    return jax.device_put(arr, NamedSharding(mesh, spec))


def tp_opt_params(mesh: Mesh, params):
    """Place an OPT param tree (plain or int8-quantized) with tp shardings.

    Divisibility: heads, ffn, and vocab must divide by ``mesh.shape['tp']``
    (true for every released OPT size at tp in {2, 4, 8}); falls back to
    replication per-array with a note when they don't.
    """
    tp = mesh.shape.get("tp", 1)
    if tp <= 1:
        return params

    def ok(arr, spec):
        shape = arr["q8"].shape if isinstance(arr, dict) else arr.shape
        for dim, ax in zip(shape, spec):
            if ax == "tp" and dim % tp:
                return False
        return True

    out = dict(params)
    blocks = {}
    for name, arr in params["blocks"].items():
        spec = _BLOCK_SPECS.get(name, P(None))
        if not ok(arr, spec):
            print(f"NOTE: tp_opt_params: {name} not divisible by tp={tp}; replicated")
            spec = P(None)
        blocks[name] = _place(arr, mesh, spec)
    out["blocks"] = blocks
    for name, arr in params.items():
        if name == "blocks":
            continue
        spec = _TOP_SPECS.get(name, P(None))
        if not ok(arr, spec):
            print(f"NOTE: tp_opt_params: {name} not divisible by tp={tp}; replicated")
            spec = P(None)
        out[name] = _place(arr, mesh, spec, sc_axis="first" if name == "embed_tokens" else "last")
    return out
