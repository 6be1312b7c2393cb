"""Generic runner: wd-split optimizer, LR schedules, checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlcf_tpu.core.runner import Runner, RunnerConfig, build_lr_schedule, decay_mask


def test_decay_mask_skips_vectors():
    params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,)), "ln": {"g": jnp.ones((4,))}}
    mask = decay_mask(params)
    assert mask["w"] is True or mask["w"] == True  # noqa: E712
    assert not mask["b"]
    assert not mask["ln"]["g"]


def test_lr_schedule_shapes():
    cfg = RunnerConfig(max_epoch=2, steps_per_epoch=100, warmup_steps=10, init_lr=1e-3, min_lr=1e-5)
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) < float(sched(10))  # warmup ascends
    assert abs(float(sched(10)) - 1e-3) < 1e-6
    assert float(sched(199)) < float(sched(50))  # cosine descends
    cfg2 = RunnerConfig(lr_sched="linear_warmup_step_lr", steps_per_epoch=10, lr_decay_rate=0.5, init_lr=1.0, warmup_steps=0)
    s2 = build_lr_schedule(cfg2)
    assert abs(float(s2(10)) - 0.5) < 1e-6


def _quadratic_runner(tmp_path, max_epoch=3):
    cfg = RunnerConfig(max_epoch=max_epoch, steps_per_epoch=5, init_lr=0.1, warmup_steps=0,
                       weight_decay=0.0, output_dir=str(tmp_path))
    params = {"w": jnp.asarray([2.0, -3.0])}
    from rlcf_tpu.core.runner import build_optimizer

    opt = build_optimizer(cfg, params)

    @jax.jit
    def train_step(p, s, batch, rng):
        loss, g = jax.value_and_grad(lambda q: jnp.sum(q["w"] ** 2))(p)
        upd, s = opt.update(g, s, p)
        import optax

        return optax.apply_updates(p, upd), s, {"loss": loss}

    runner = Runner(cfg, params, train_step)
    runner.opt = opt
    runner.opt_state = opt.init(params)
    return runner


def test_runner_trains_and_checkpoints(tmp_path):
    runner = _quadratic_runner(tmp_path)
    history = runner.train(lambda: [None] * 5)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert (tmp_path / "checkpoint_latest.npz").exists()


def test_runner_resume(tmp_path):
    runner = _quadratic_runner(tmp_path, max_epoch=2)
    runner.train(lambda: [None] * 5)
    w_after = np.asarray(runner.params["w"]).copy()

    fresh = _quadratic_runner(tmp_path, max_epoch=2)
    fresh.load_checkpoint(str(tmp_path / "checkpoint_latest.npz"))
    np.testing.assert_allclose(np.asarray(fresh.params["w"]), w_after)
    assert fresh.start_epoch == 2
