"""The TTA episode engine: one test sample's adaptation as a pure function.

The reference's per-sample loop (`TPT/tpt_cls_rl.py:47-79,219-279`) —
snapshot weights, AdamW steps of reward-weighted CE on confident augmented
views, predict, restore weights, restore optimizer state — becomes a pure
function

    episode(trainable0, views) -> (final_logits, aux)

compiled once and vmapped over the test stream. Weight/optimizer "reset"
(`tpt_cls_rl.py:251-255`) is free: every episode starts from the same
``trainable0`` and a freshly initialized optax state (AdamW state snapshots at
step 0 are all-zeros, identical semantics).

Scheduling matches the reference exactly:
- step 0 either shares one policy forward between confidence selection and
  the first gradient (jax.vjp + masked cotangent; used when selection keeps
  every view or the caller's policy_logits cost is idx-independent) or
  recomputes the forward on the selected subset (cheaper whenever the cost
  scales with the view count and S < 2B/3 — encoder TTA); identical math;
- the frozen reward tower encodes only the selected views, once per episode;
- the reward similarity matrix is fixed thereafter; per-step reward lookup is
  a gather, so each TTA step costs one policy forward+backward only.

Loss variants: "rlcf" (REINFORCE, `tpt_cls_rl.py:63-74`), "tpt" (marginal
entropy, `tpt_cls.py:49-78`), "kd"/"dkd"/"atkd" (`tune_cls_kd.py:34-61`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from . import losses as Lo


@dataclasses.dataclass(frozen=True)
class EpisodeConfig:
    tta_steps: int = 3
    selection_p: float = 0.1
    lr: float = 5e-3
    weight_decay: float = 5e-4
    loss: str = "rlcf"  # rlcf | tpt | kd | dkd | atkd
    sample_k: int = 5
    min_entropy_reg: bool = False
    min_entropy_w: float = 0.1
    adam_eps: float = 1e-8  # retrieval uses 1e-6 (`clip_ret_policy.py:235`)


def make_optimizer(ecfg: EpisodeConfig) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas 0.9/0.999, decoupled wd),
    matching `TPT/tpt_cls_rl.py:120`."""
    return optax.adamw(ecfg.lr, b1=0.9, b2=0.999, eps=ecfg.adam_eps, weight_decay=ecfg.weight_decay)


def step_loss(logits, reward_sim, ecfg: EpisodeConfig, score_samples: Optional[Callable], teacher_scale=None):
    """Per-step loss on the selected views' logits.

    ``reward_sim`` [S, C]: frozen reward cosine sims for the selected views.
    ``score_samples(sim, idx)`` turns gathered sims into processed rewards.
    """
    if ecfg.loss == "rlcf":
        _, idx = jax.lax.top_k(logits, ecfg.sample_k)  # [S, K]
        rewards = jax.lax.stop_gradient(score_samples(reward_sim, idx))
        loss = Lo.reinforce_loss(logits, idx, rewards)
        if ecfg.min_entropy_reg:
            loss = loss + ecfg.min_entropy_w * Lo.avg_entropy(logits)
        return loss
    if ecfg.loss == "tpt":
        return Lo.avg_entropy(logits)
    teacher = jax.lax.stop_gradient(teacher_scale * reward_sim)
    if ecfg.loss == "kd":
        # v2: gradient-equivalent part of the KL (`TPT/utils/KD.py:19-29`)
        p_t = jax.nn.softmax(teacher, axis=-1)
        logp_s = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(-jnp.sum(p_t * logp_s, axis=-1))
    if ecfg.loss == "dkd":
        return Lo.dkd_loss(logits, teacher, jnp.argmax(teacher, axis=-1))
    if ecfg.loss == "atkd":
        return Lo.atkd_loss(logits, teacher)
    raise ValueError(ecfg.loss)


def make_tta_episode(
    policy_logits: Callable,
    reward_image_sim: Callable,
    score_samples: Callable,
    ecfg: EpisodeConfig,
    predict_batched: bool = False,
    teacher_scale=None,
    return_adapted: bool = False,
    step0_reuse: Optional[bool] = None,
):
    """Build the generic episode function.

    Args:
      policy_logits(trainable, cache, idx) -> [len(idx), C] logits for the
        views selected by index array ``idx``. ``cache`` holds per-episode
        precomputed values (frozen image features for prompt-TTA, class text
        features + raw views for encoder-TTA). Differentiable wrt
        ``trainable``. Computing on ``idx`` only is what keeps encoder-TTA
        steps to S-view forwards, like `tune_cls_rl` after selection.
      reward_image_sim(views_selected) -> [S, C] frozen reward similarities.
      score_samples(sim, idx) -> flat processed rewards.
      predict_batched: if True the final prediction returns logits for all
        views; otherwise view 0 only (`tpt_cls_rl.py:260-262`).

    Returns episode(trainable0, cache, views) -> (final_logits, aux).
    """
    opt = make_optimizer(ecfg)

    def episode(trainable0, cache, views):
        B = views.shape[0]
        n_keep = max(1, int(B * ecfg.selection_p))
        all_idx = jnp.arange(B)

        # Step-0 strategy. When selection keeps every view (retrieval:
        # selection_p=1), reuse the selection forward's linearization for the
        # step-0 gradient (masked-cotangent VJP — no recompute). When it keeps
        # a small subset S << B AND policy_logits costs ~len(idx) (encoder
        # TTA: the differentiated visual tower), that VJP backprops a mostly-
        # zero cotangent through the FULL B-view tower — 2x fwd(B) of
        # backward for grads only S rows contribute to. Recomputing the
        # forward on the S selected views instead costs 3x fwd(S) total
        # (identical math: same params, same inputs), 64->6 views a ~2x
        # episode-FLOP cut, and the B-view selection forward keeps no
        # residuals at all (less live memory, less remat pressure).
        # ``step0_reuse`` overrides the heuristic for callers whose
        # policy_logits cost does NOT scale with len(idx) (CoCoOp: the text
        # tower re-runs fully either way, so reuse is strictly cheaper).
        reuse_vjp = n_keep >= B if step0_reuse is None else step0_reuse
        if reuse_vjp:
            f = lambda t: policy_logits(t, cache, all_idx)
            logits_all, f_vjp = jax.vjp(f, trainable0)
        else:
            logits_all = policy_logits(trainable0, cache, all_idx)
        ent = Lo.entropy_per_sample(logits_all)
        sel = Lo.select_confident_entropy(ent, n_keep)  # lowest-entropy view indices [S]

        reward_sim = reward_image_sim(views[sel])  # [S, C] frozen

        def loss_from_sel(logits_sel):
            return step_loss(logits_sel, reward_sim, ecfg, score_samples, teacher_scale)

        opt_state0 = opt.init(trainable0)
        pred_idx = all_idx if predict_batched else all_idx[:1]

        if ecfg.tta_steps == 0:
            aux0 = {"losses": jnp.zeros((0,)), "selected": sel}
            if return_adapted:
                aux0["adapted"] = trainable0
            return policy_logits(trainable0, cache, pred_idx), aux0

        def later_step(carry, _):
            t, s = carry
            loss, g = jax.value_and_grad(lambda tt: loss_from_sel(policy_logits(tt, cache, sel)))(t)
            upd, s = opt.update(g, s, t)
            t = optax.apply_updates(t, upd)
            return (t, s), loss

        if reuse_vjp:
            # Step 0: reuse the selection forward via a masked-cotangent VJP.
            loss0, d_sel = jax.value_and_grad(loss_from_sel)(logits_all[sel])
            d_all = jnp.zeros_like(logits_all).at[sel].set(d_sel)
            (g0,) = f_vjp(d_all)
            updates, opt_state = opt.update(g0, opt_state0, trainable0)
            trainable = optax.apply_updates(trainable0, updates)
            (trainable, _), later_losses = jax.lax.scan(
                later_step, (trainable, opt_state), None, length=ecfg.tta_steps - 1
            )
            losses = jnp.concatenate([loss0[None], later_losses])
        else:
            # Step 0 recomputes the forward on the selected views (3x fwd(S)
            # beats 2x fwd(B) of masked backward whenever S < 2B/3).
            (trainable, _), losses = jax.lax.scan(
                later_step, (trainable0, opt_state0), None, length=ecfg.tta_steps
            )

        aux = {"losses": losses, "selected": sel}
        if return_adapted:
            aux["adapted"] = trainable
        return policy_logits(trainable, cache, pred_idx), aux

    return episode
