"""Device-mesh construction and episode sharding.

TTA episodes are embarrassingly parallel (every episode resets to the same
initial state — SURVEY §2.5), so the primary axis is **dp**: the episode
stream is sharded across chips and each chip runs whole episodes; the only
cross-chip communication is metric aggregation. A secondary **tp** axis
shards the long class/gallery axis (1000 prompts, ~25k captions): class text
features, reward similarity columns, and the logits' class dimension are
partitioned, with XLA inserting the (all-gather/psum) collectives over ICI.

The reference has no exercised distribution (single GPU by design,
`TPT/params.py:92-93`); this module is the TPU-native replacement for the
vestigial NCCL path (`retrieval/lavis/common/dist_utils.py:57-90`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-HOST bootstrap (pods/slices): call before any backend use.

    The TPU-native replacement for the reference's NCCL/SLURM bootstrap
    (`dist_utils.py:57-90`): `jax.distributed.initialize()` discovers peers
    from the TPU/megascale environment automatically. Single-host setups
    (including this repo's 1-chip dev box and the virtual CPU mesh) need no
    initialization — we only call it when the environment advertises a
    multi-host topology. Returns True when initialization ran.
    """
    import os

    workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    multi_host_env = (
        bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
        or bool(os.environ.get("WORLD_SIZE"))  # torchrun-style launchers
        or len(workers) > 1  # single-host axon sets TPU_WORKER_HOSTNAMES=localhost
    )
    if not multi_host_env:
        return False
    # Explicit process topology, when the launcher provides one: JAX-style
    # (JAX_NUM_PROCESSES/JAX_PROCESS_ID) or the torch-style RANK/WORLD_SIZE/
    # MASTER_ADDR the reference's bootstrap consumes (`dist_utils.py:57-76`).
    # Cloud TPU pods need neither — initialize() autodetects peers.
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs = dict(
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    elif os.environ.get("WORLD_SIZE"):
        kwargs = dict(
            coordinator_address=(
                os.environ.get("MASTER_ADDR", "127.0.0.1")
                + ":" + os.environ.get("MASTER_PORT", "29500")
            ),
            num_processes=int(os.environ["WORLD_SIZE"]),
            process_id=int(os.environ.get("RANK", "0")),
        )
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` visible devices.

    Raises a descriptive ``ValueError`` when the request cannot be satisfied
    (fewer devices visible than asked for, or ``dp * tp`` not matching), so
    callers see the actual device topology instead of a bare assert.
    """
    visible = jax.devices()
    if n_devices is not None and n_devices > len(visible):
        raise ValueError(
            f"make_mesh: {n_devices} devices requested but only {len(visible)} visible "
            f"({visible[0].platform}). For multi-chip testing on a single host, force a "
            f"virtual CPU mesh BEFORE first backend use: "
            f'jax.config.update("jax_platforms", "cpu"); '
            f'jax.config.update("jax_num_cpu_devices", {n_devices}).'
        )
    devices = visible[: n_devices or len(visible)]
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(
                f"make_mesh: tp={tp} does not divide the {n} visible devices; "
                f"pick tp from the divisors of {n}."
            )
        dp = n // tp
    if dp * tp != n:
        raise ValueError(
            f"make_mesh: dp({dp}) * tp({tp}) != devices({n}); "
            f"dp and tp must factor the device count exactly."
        )
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def episode_shardings(mesh: Mesh):
    """(in, out) shardings for a batched episode fn: batch axis over dp."""
    data = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())
    return data, replicated


def shard_batched_episode(batched_episode_fn, mesh: Mesh):
    """jit a vmapped episode fn with the episode batch sharded over dp.

    The function must take (views_batch [N, ...]) with N divisible by the dp
    size; params captured in closure are replicated.
    """
    data, _ = episode_shardings(mesh)
    return jax.jit(batched_episode_fn, in_shardings=(data,))


def class_sharded(mesh: Mesh, array, axis: int = 0):
    """Place an array with its class/gallery axis sharded over tp."""
    spec = [None] * array.ndim
    spec[axis] = "tp"
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def dp_put(mesh, arr):
    """Place ``arr`` sharded over dp on axis 0 when the size tiles the axis;
    replicate otherwise (batched-episode placement policy, one definition).

    The fallback is loud: a batch that does not tile dp quietly serializes
    whole-episode work onto fewer chips, so — like the tp fallbacks — it
    prints a NOTE once per (batch-size, dp) shape. Callers should round
    episode groups to a dp multiple (see :func:`round_to_dp`).
    """
    import sys

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if mesh is None or "dp" not in mesh.shape:
        return arr
    dp = mesh.shape["dp"]
    if arr.shape[0] % dp != 0:
        key = (arr.shape[0], dp)
        if key not in _dp_put_warned:
            _dp_put_warned.add(key)
            print(
                f"NOTE: dp_put: batch of {arr.shape[0]} does not tile dp={dp}; "
                f"running UNSHARDED (single-chip). Round the episode group to a "
                f"multiple of dp (e.g. --episode_group {max(dp, arr.shape[0] // dp * dp)}).",
                file=sys.stderr,
            )
        return arr
    return jax.device_put(arr, NamedSharding(mesh, PartitionSpec("dp")))


_dp_put_warned: set = set()


def round_to_dp(group_size: int, mesh) -> int:
    """Round an episode-group size up to a multiple of the mesh's dp axis."""
    if mesh is None or "dp" not in mesh.shape:
        return group_size
    dp = mesh.shape["dp"]
    return max(dp, -(-group_size // dp) * dp)
