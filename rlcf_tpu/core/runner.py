"""Generic training/eval runner (the LAVIS ``RunnerBase`` equivalent).

Covers the orchestration surface of `retrieval/lavis/runners/runner_base.py`:
optimizer construction with a weight-decay split (`runner_base.py:103-120`),
linear-warmup + cosine/step LR schedules (`:141-171`), epoch train/eval loops
(`:357-476`), and checkpointing that saves model/optimizer/config/epoch and
resumes at epoch+1 (`:565-635`) — expressed functionally: the model is a
param pytree, the step is a jitted pure function, and checkpoints are
npz-serialized flat trees.

The RLCF pipelines only exercise evaluation + the caption trainer, but this
runner generalizes them for users who trained models through LAVIS.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class RunnerConfig:
    max_epoch: int = 10
    init_lr: float = 1e-4
    min_lr: float = 1e-6
    warmup_lr: float = 1e-8
    warmup_steps: int = 0
    weight_decay: float = 0.05
    lr_sched: str = "linear_warmup_cosine_lr"  # or linear_warmup_step_lr
    lr_decay_rate: float = 0.9
    steps_per_epoch: int = 1000
    output_dir: str = "output"
    evaluate_only: bool = False
    seed: int = 42


def decay_mask(params) -> Any:
    """True where weight decay applies: ndim >= 2 (skips norms/bias), the
    torch convention the LAVIS wd split reproduces (`runner_base.py:103-120`)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def build_lr_schedule(cfg: RunnerConfig) -> Callable:
    total = cfg.max_epoch * cfg.steps_per_epoch

    def sched(step):
        warm = cfg.warmup_lr + (cfg.init_lr - cfg.warmup_lr) * step / jnp.maximum(cfg.warmup_steps, 1)
        if cfg.lr_sched == "linear_warmup_cosine_lr":
            t = (step - cfg.warmup_steps) / jnp.maximum(total - cfg.warmup_steps, 1)
            main = cfg.min_lr + 0.5 * (cfg.init_lr - cfg.min_lr) * (1 + jnp.cos(jnp.pi * jnp.clip(t, 0, 1)))
        else:  # step decay per epoch
            epoch = step // cfg.steps_per_epoch
            main = cfg.init_lr * cfg.lr_decay_rate ** epoch
        return jnp.where(step < cfg.warmup_steps, warm, main)

    return sched


def build_optimizer(cfg: RunnerConfig, params) -> optax.GradientTransformation:
    """Decoupled AdamW (torch semantics): decay is added AFTER Adam's moment
    normalization, like torch.optim.AdamW / optax.adamw."""
    sched = build_lr_schedule(cfg)
    return optax.chain(
        optax.scale_by_adam(),
        optax.masked(optax.add_decayed_weights(cfg.weight_decay), decay_mask(params)),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )


def _flatten(tree) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = np.asarray(leaf)
    return out


def _unflatten(template, flat: Dict[str, np.ndarray]):
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        leaves.append(jnp.asarray(flat[name]))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)


class Runner:
    """Epoch-driven trainer around a jitted ``train_step``.

    train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics)
    """

    def __init__(self, cfg: RunnerConfig, params, train_step: Callable, eval_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.params = params
        self.opt = build_optimizer(cfg, params)
        self.opt_state = self.opt.init(params)
        self.train_step = train_step
        self.eval_fn = eval_fn
        self.start_epoch = 0
        self.best_metric = -np.inf

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, epoch: int, is_best: bool = False):
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        payload = {f"model/{k}": v for k, v in _flatten(self.params).items()}
        payload.update({f"opt/{k}": v for k, v in _flatten(self.opt_state).items()})
        payload["__epoch__"] = np.asarray(epoch)
        name = "checkpoint_best.npz" if is_best else f"checkpoint_{epoch}.npz"
        np.savez(os.path.join(self.cfg.output_dir, name), **payload)
        np.savez(os.path.join(self.cfg.output_dir, "checkpoint_latest.npz"), **payload)

    def load_checkpoint(self, path: str):
        data = dict(np.load(path, allow_pickle=False))
        model_flat = {k[len("model/"):]: v for k, v in data.items() if k.startswith("model/")}
        opt_flat = {k[len("opt/"):]: v for k, v in data.items() if k.startswith("opt/")}
        self.params = _unflatten(self.params, model_flat)
        self.opt_state = _unflatten(self.opt_state, opt_flat)
        self.start_epoch = int(data["__epoch__"]) + 1

    # -- loops ------------------------------------------------------------

    def train(self, train_loader_fn: Callable[[], Iterable], eval_loader_fn: Optional[Callable] = None):
        rng = jax.random.PRNGKey(self.cfg.seed)
        history = []
        for epoch in range(self.start_epoch, self.cfg.max_epoch):
            total, count = 0.0, 0
            for batch in train_loader_fn():
                rng, sub = jax.random.split(rng)
                self.params, self.opt_state, metrics = self.train_step(self.params, self.opt_state, batch, sub)
                total += float(metrics["loss"])
                count += 1
            epoch_loss = total / max(count, 1)
            record = {"epoch": epoch, "train_loss": epoch_loss}
            if self.eval_fn and eval_loader_fn:
                eval_metrics = self.eval_fn(self.params, eval_loader_fn())
                record.update(eval_metrics)
                agg = eval_metrics.get("agg_metrics", -epoch_loss)
                if agg > self.best_metric:
                    self.best_metric = agg
                    self.save_checkpoint(epoch, is_best=True)
            history.append(record)
            self.save_checkpoint(epoch)
        return history
