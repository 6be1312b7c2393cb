"""Policy state utilities: trainable-subset partitioning and momentum-EMA.

Functional equivalents of the reference policy wrappers' state machines
(`TPT/clip/custom_clip.py:364-497`):

- ``partition``/``merge`` replace the overridden ``parameters()`` that limits
  AdamW to the visual tower or only its normalization layers
  (`custom_clip.py:477-485`).
- ``MomentumState`` replaces the momentum/initial/clip state-dict triple and
  ``momentum_update_model`` (`custom_clip.py:460-475`): after each episode the
  EMA absorbs the adapted weights; every ``update_freq`` episodes the episode
  start point is re-anchored to ``(1-w)*orig + w*ema``. Weight "reset" per
  episode is implicit (episodes always start from ``reset_params``).
"""

from __future__ import annotations

import dataclasses
import functools as _functools
from typing import Any, Callable, Tuple

import jax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def norm_only_filter(path: str) -> bool:
    """True for LayerNorm / BatchNorm affine params (only_norm mode)."""
    tail = path.rsplit("/", 1)[-1]
    is_ln = ("ln" in path and tail in ("ln1_w", "ln1_b", "ln2_w", "ln2_b")) or tail.startswith(
        ("ln_pre", "ln_post", "ln_final", "ln1", "ln2")
    )
    is_bn = "/bn" in path and tail in ("w", "b")
    return is_ln or is_bn


def partition(params, predicate: Callable[[str], bool]) -> Tuple[Any, Any]:
    """Split a pytree into (selected, rest) by path predicate; non-selected
    leaves become None placeholders so the trees stay mergeable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    sel, rest = [], []
    for path, leaf in flat:
        if predicate(_path_str(path)):
            sel.append(leaf)
            rest.append(None)
        else:
            sel.append(None)
            rest.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, sel), jax.tree_util.tree_unflatten(treedef, rest)


def merge(selected, rest):
    """Inverse of :func:`partition` (leaf-wise first-non-None)."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, selected, rest, is_leaf=lambda x: x is None
    )


@dataclasses.dataclass
class MomentumState:
    """Cross-episode EMA of adapted weights (`momentum_update_model`)."""

    orig_params: Any          # pristine checkpoint weights (clip_state_dict)
    reset_params: Any         # episode starting point (initial_state_dict)
    ema_params: Any           # momentum_state_dict
    counter: int = 0

    @classmethod
    def create(cls, params):
        return cls(orig_params=params, reset_params=params, ema_params=params)


def momentum_update(state: MomentumState, adapted, momentum: float = 0.9999, update_freq: int = 256, update_w: float = 1.0) -> MomentumState:
    """Fold one episode's adapted params into the EMA; re-anchor every
    ``update_freq`` episodes (`custom_clip.py:460-475`)."""
    ema = jax.tree_util.tree_map(lambda e, a: momentum * e + (1.0 - momentum) * a, state.ema_params, adapted)
    counter = state.counter + 1
    if counter >= update_freq:
        reset = jax.tree_util.tree_map(
            lambda o, e: (1.0 - update_w) * o + update_w * e, state.orig_params, ema
        )
        return MomentumState(state.orig_params, reset, ema, 0)
    return MomentumState(state.orig_params, state.reset_params, ema, counter)


@_functools.partial(jax.jit, static_argnames=("m", "freq", "w"))
def _momentum_fold(ema0, reset0, counter0, orig, stack, m, freq, w):
    import jax.numpy as jnp

    def step(carry, a_i):
        ema, reset, counter = carry
        ema = jax.tree_util.tree_map(lambda e, a: m * e + (1.0 - m) * a, ema, a_i)
        counter = counter + 1
        fire = counter >= freq
        reset = jax.tree_util.tree_map(
            lambda o, e, r: jnp.where(fire, (1.0 - w) * o + w * e, r), orig, ema, reset
        )
        counter = jnp.where(fire, 0, counter)
        return (ema, reset, counter), None

    (ema, reset, counter), _ = jax.lax.scan(
        step, (ema0, reset0, jnp.asarray(counter0, jnp.int32)), stack
    )
    return ema, reset, counter


def momentum_update_batch(
    state: MomentumState, adapted_stack, momentum: float = 0.9999, update_freq: int = 256, update_w: float = 1.0
) -> MomentumState:
    """Fold a GROUP of adapted params (stacked on a leading axis) in episode
    order — one fused device scan instead of N host-side tree-slice loops.

    Bit-identical to applying ``momentum_update`` sequentially (same fold
    order, mid-group re-anchors included); only the host<->device sync
    pattern changes (one launch per group, one counter read-back). The scan
    is a module-level jit (``_momentum_fold``) so repeated groups hit the
    trace cache instead of re-tracing per call.
    """
    ema, reset, counter = _momentum_fold(
        state.ema_params, state.reset_params, state.counter, state.orig_params, adapted_stack,
        m=momentum, freq=update_freq, w=update_w,
    )
    return MomentumState(state.orig_params, reset, ema, int(counter))
