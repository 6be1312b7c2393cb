"""Runtime helpers: persistent compilation cache, timing, device info.

The TPU in this environment is reached through a high-latency tunnel
(~300 ms per host sync) and compiles cost tens of seconds, so every entry
point enables JAX's persistent compilation cache and avoids host round-trips
in hot loops.
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(path: str = os.path.expanduser("~/.cache/rlcf_jax_cache")):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class StepTimer:
    """Wall-clock timer that forces device completion via a tiny host read."""

    def __init__(self):
        self.t0 = None

    def start(self):
        self.t0 = time.perf_counter()
        return self

    def stop(self, result=None) -> float:
        if result is not None:
            import numpy as np
            import jax

            leaf = jax.tree_util.tree_leaves(result)[0]
            np.asarray(leaf).ravel()[:1]
        return time.perf_counter() - self.t0
