"""AOT export of jitted TTA functions for serving (jax.export / StableHLO).

The reference deploys by shipping Python + torch checkpoints; the TPU-native
equivalent is an ahead-of-time-lowered artifact: the full TTA episode (frozen
towers + REINFORCE scan) serializes to portable StableHLO that a serving
binary (or a later JAX process) executes without retracing Python. Weights
stay call arguments, so the artifact is small and one export serves any
checkpoint of the same architecture.

Typical flow::

    clf = PromptTTAClassifier(...).setup(classnames)
    blob = export_serving(clf.serving_fn(), clf.serving_example_args(views_shape))
    save_exported("episode.rlcfx", blob)
    # serving side (no model code needed):
    call = load_exported("episode.rlcfx")
    logits = call(cparams, rparams, tf0, r_feats, views)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

MAGIC = b"RLCFX001"


def _shape_struct(tree):
    return jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree)


def export_serving(fn: Callable, example_args: Sequence, platforms: Optional[Sequence[str]] = None) -> bytes:
    """Lower ``fn(*example_args)`` to serialized StableHLO.

    Note: a function traced on TPU with the fused Pallas attention/viewgen
    paths embeds Mosaic custom calls — such artifacts serve on TPU only.
    For a cross-platform artifact, export from a CPU process (tests do) or
    build the task with dense attention.

    ``platforms``: e.g. ("tpu",), ("tpu", "cpu") for a multi-platform
    artifact; defaults to the current backend.
    """
    from jax import export as jexport

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jexport.export(jax.jit(fn), **kwargs)(*_shape_struct(tuple(example_args)))
    return MAGIC + exp.serialize()


def deserialize_call(data: bytes) -> Callable:
    """Rehydrate an exported artifact into a callable (runs under jit)."""
    from jax import export as jexport

    if not data.startswith(MAGIC):
        raise ValueError("not an rlcf-tpu export artifact (bad magic)")
    exp = jexport.deserialize(data[len(MAGIC):])

    def call(*args):
        return exp.call(*args)

    return call


def save_exported(path: str, data: bytes) -> None:
    with open(path, "wb") as fh:
        fh.write(data)


def load_exported(path: str) -> Callable:
    with open(path, "rb") as fh:
        return deserialize_call(fh.read())
