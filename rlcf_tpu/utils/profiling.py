"""Profiling/tracing hooks (the rebuild's observability layer).

The reference logs wall-clock + max GPU memory (`TPT/tpt_cls_rl.py:194-216`);
here: jax.profiler trace contexts for TensorBoard-viewable TPU traces,
per-episode step timing with pipeline-drain semantics, and device memory
stats where the backend exposes them.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, float]:
    """Peak/current HBM usage in GiB for device 0 (best-effort)."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    gib = 1024**3
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "gib")] = round(stats[key] / gib, 3)
    return out


class EpisodeTimer:
    """Throughput meter that drains the device pipeline per block."""

    def __init__(self):
        self.episodes = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_episodes: int, result=None):
        if result is not None:
            import numpy as np
            import jax

            np.asarray(jax.tree_util.tree_leaves(result)[0]).ravel()[:1]
        self.seconds += time.perf_counter() - self._t0
        self.episodes += n_episodes

    @property
    def eps_per_sec(self) -> float:
        return self.episodes / max(self.seconds, 1e-9)
