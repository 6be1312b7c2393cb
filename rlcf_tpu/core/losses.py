"""TTA losses: CLIP-reward REINFORCE, marginal-entropy (TPT), and KD variants.

Parity targets in the reference:
- reward-weighted CE: ``mean(rewards * CE(repeat_interleave(logits, K), idx))``
  (`TPT/tpt_cls_rl.py:63-71`)
- confident-view selection by prediction entropy (`TPT/tpt_cls_rl.py:32-35`)
- marginal entropy of the averaged distribution (`TPT/tpt_cls_rl.py:38-44`)
- reward post-processing: baseline subtraction / standardization
  (`TPT/clip_reward.py:152-165`)
- KD losses (`TPT/utils/KD.py:7-29`, `DKD.py:13-37`, `ATKD.py:12-42`)

All functions are pure and jit/vmap-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def entropy_per_sample(logits):
    """H(softmax(logits)) per row, computed from log-probs. [.., C] -> [..]"""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def select_confident_entropy(ent, n_keep: int):
    """Indices of the ``n_keep`` lowest entropies along the last axis.

    Single implementation shared by episode/classification selection; ties
    broken by ascending index (top_k is stable on equal keys).
    """
    return jax.lax.top_k(-ent, n_keep)[1]


def select_confident(logits, selection_p: float):
    """Indices of the ``floor(B * selection_p)`` lowest-entropy rows (min 1).

    Floor matches the reference's ``int(batch_entropy.size()[0] * top)``
    (`TPT/tpt_cls_rl.py:32-35`). Static output shape.
    """
    batch = logits.shape[0]
    n_keep = max(1, int(batch * selection_p))
    return select_confident_entropy(entropy_per_sample(logits), n_keep)


def avg_entropy(logits):
    """Entropy of the view-averaged predictive distribution [N, C] -> scalar."""
    logp = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    avg_logp = jax.nn.logsumexp(logp, axis=0) - jnp.log(jnp.asarray(logp.shape[0], logp.dtype))
    min_real = jnp.finfo(avg_logp.dtype).min
    avg_logp = jnp.clip(avg_logp, min=min_real)
    return -jnp.sum(avg_logp * jnp.exp(avg_logp), axis=-1)


def rewards_post_process(scores, reward_process: bool = True, amplify: bool = False, eps: float = 1e-5):
    """Baseline-subtract (optionally standardize) along the last axis, flatten.

    ``scores`` is [B, K] (per-sample baseline) or [B*K] (batch baseline),
    matching `TPT/clip_reward.py:152-165` — note torch.std is Bessel-corrected,
    reproduced here.
    """
    if scores.shape[-1] > 1 and reward_process:
        mean = jnp.mean(scores, axis=-1, keepdims=True)
        if amplify:
            n = scores.shape[-1]
            std = jnp.std(scores, axis=-1, keepdims=True) * jnp.sqrt(n / (n - 1)) + eps
        else:
            std = 1.0
        scores = (scores - mean) / std
    return scores.reshape(-1)


def clipscore(similarity, weight: float = 2.5):
    """CLIPScore = weight * max(cos, 0) (`TPT/clip_reward.py:111-128`)."""
    return weight * jnp.maximum(similarity, 0.0)


def reinforce_loss(logits, sampled_idx, rewards):
    """mean(rewards * CE) over all (row, sample) pairs.

    logits: [B, C]; sampled_idx: [B, K] class indices; rewards: [B*K] flat.
    """
    B, K = sampled_idx.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, sampled_idx, axis=-1)  # [B, K]
    return jnp.mean(rewards.reshape(B, K) * ce)


def confidence_gap(predictions):
    """Top1-minus-top2 gap, mean-centered (`TPT/clip_reward.py:63-73`)."""
    top2 = jax.lax.top_k(predictions, 2)[0]
    gap = top2[:, 0] - top2[:, 1]
    return gap - jnp.mean(gap)


# ---------------------------------------------------------------------------
# KD family (teacher = frozen reward CLIP logits)
# ---------------------------------------------------------------------------


def kd_loss(logits_student, logits_teacher, t_stu: float = 1.0, t_tea: float = 1.0):
    """Vanilla KD: KLDiv(teacher || student) * T_stu^2, batchmean."""
    logp_s = jax.nn.log_softmax(logits_student / t_stu, axis=-1)
    p_t = jax.nn.softmax(logits_teacher / t_tea, axis=-1)
    logp_t = jax.nn.log_softmax(logits_teacher / t_tea, axis=-1)
    kl = jnp.sum(p_t * (logp_t - logp_s), axis=-1)
    return jnp.mean(kl) * t_stu * t_stu


def dkd_loss(logits_student, logits_teacher, target, alpha: float = 1.0, beta: float = 0.5, temperature: float = 1.0):
    """Decoupled KD (target/non-target split), `TPT/utils/DKD.py:13-37`."""
    B, C = logits_student.shape
    gt_mask = jax.nn.one_hot(target, C, dtype=logits_student.dtype)
    p_s = jax.nn.softmax(logits_student / temperature, axis=-1)
    p_t = jax.nn.softmax(logits_teacher / temperature, axis=-1)

    def two_bin(p):
        t1 = jnp.sum(p * gt_mask, axis=-1, keepdims=True)
        return jnp.concatenate([t1, 1.0 - t1], axis=-1)

    b_s, b_t = two_bin(p_s), two_bin(p_t)
    tckd = jnp.sum(b_t * (jnp.log(b_t + 1e-12) - jnp.log(b_s + 1e-12))) * temperature**2 / B

    masked_s = jax.nn.log_softmax(logits_student / temperature - 1000.0 * gt_mask, axis=-1)
    masked_t_logp = jax.nn.log_softmax(logits_teacher / temperature - 1000.0 * gt_mask, axis=-1)
    masked_t = jnp.exp(masked_t_logp)
    nckd = jnp.sum(masked_t * (masked_t_logp - masked_s)) * temperature**2 / B
    return alpha * tckd + beta * nckd


def atkd_loss(logits_student, logits_teacher, multiplier: float = 2.0, eps: float = 1e-5):
    """Adaptive-temperature KD v1 (`TPT/utils/ATKD.py:12-33`).

    Logits are per-row standardized (biased std, stop-gradient stats), the KL
    is rescaled by the student's variance.
    """
    s_mu = jax.lax.stop_gradient(jnp.mean(logits_student, axis=-1, keepdims=True))
    s_std = jax.lax.stop_gradient(jnp.std(logits_student, axis=-1, keepdims=True))
    t_mu = jnp.mean(logits_teacher, axis=-1, keepdims=True)
    t_std = jnp.std(logits_teacher, axis=-1, keepdims=True)
    norm_s = (logits_student - s_mu) / (s_std + eps) * multiplier
    norm_t = (logits_teacher - t_mu) / (t_std + eps) * multiplier
    logp_s = jax.nn.log_softmax(norm_s, axis=-1)
    logp_t = jax.nn.log_softmax(norm_t, axis=-1)
    p_t = jnp.exp(logp_t)
    kl = p_t * (logp_t - logp_s) * s_std * s_std
    return jnp.mean(jnp.sum(kl, axis=-1))
