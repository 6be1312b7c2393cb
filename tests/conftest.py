"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a virtual mesh per the TPU testing
recipe (``--xla_force_host_platform_device_count=8``).

Note: this environment pre-imports jax (sitecustomize) with the axon TPU
platform selected, so JAX_PLATFORMS in os.environ is already consumed; the
platform must be overridden through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Golden-fixture auto-regeneration
#
# The large reference-replay fixtures (up to ~27 MB each) are NOT committed
# (review finding: binary fixtures permanently bloat clones); each generator
# replays the upstream torch code on random weights in seconds. Regenerate
# any missing ones once per session when the read-only reference checkout +
# torch are available; tests whose fixture still can't exist skip/fail with
# a pointer to the generator.
# ---------------------------------------------------------------------------

def _regen_missing_goldens():
    import subprocess
    import sys as _sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    fixtures = root / "tests" / "fixtures"
    generators = {  # fixture -> generator script under tools/
        "golden_episode.npz": "gen_golden_episode.py",
        "golden_episode_encoder.npz": "gen_golden_episode.py",
        "golden_episode_encoder_momentum.npz": "gen_golden_episode.py",
        "golden_caption_episode.npz": "gen_golden_caption_episode.py",
        "golden_clip_vit.npz": "gen_golden_clip.py",
        "golden_clip_rn.npz": "gen_golden_clip.py",
        "golden_clip_rn2.npz": "gen_golden_clip.py",
        "golden_mapper_transformer.npz": "gen_golden_mapper.py",
        "golden_mapper_mlp.npz": "gen_golden_mapper.py",
    }
    needed = sorted({g for f, g in generators.items() if not (fixtures / f).exists()})
    if not needed:
        return
    try:
        import torch  # noqa: F401
    except ImportError:
        print("NOTE: golden fixtures missing and torch unavailable; parity tests will skip")
        return
    for script in needed:
        print(f"[conftest] regenerating golden fixtures via tools/{script} ...")
        try:
            subprocess.run(
                [_sys.executable, str(root / "tools" / script)],
                check=True, timeout=900, cwd=str(root),
                stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
            )
        except Exception as e:
            print(f"NOTE: tools/{script} failed ({e}); dependent parity tests will skip")


_regen_missing_goldens()
