"""Bongard-HOI few-shot prompt test-time adaptation.

The reference wires Bongard-HOI through the prompt-TTA entry as a binary
few-shot problem: ``get_coop`` builds a 2-class prompt learner — classnames
``['X', 'X']`` with a learnable class token when ``learned_cls`` is set, else
``['True', 'False']`` (`TPT/clip/custom_clip.py:347-361`,
`custom_clip.py:90-107` for the learnable token init) — and
``BongardDataset`` serves each task as 6 positive + 6 negative support images
plus one query per polarity with ``support_labels = [0]*6 + [1]*6`` (positive
class = index 0) and ``query_labels = [neg, pos] = [1, 0]``
(`TPT/data/hoi_dataset.py:79-111`).

The per-task episode here is the natural TPU mapping of those semantics:

1. encode all 14 task images once with the frozen visual tower (one batched
   MXU-friendly forward; support and query share it),
2. ``tta_steps`` AdamW updates of the prompt context (and learnable class
   token) under cross-entropy on the *labelled support set* — the few-shot
   signal the Bongard task provides — re-running only the tiny 2-class text
   tower per step,
3. classify the two held-out queries with the adapted prompt.

Tasks are batched ``episode_group`` at a time: image encoding flattens to one
[N*14] batch, episodes vmap over tasks. Everything weight-derived flows in as
jit arguments (repo-wide rule: no baked multi-MB constants in executables).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import clip as clip_model
from ..core.episode import EpisodeConfig, make_optimizer


N_SUPPORT = 12  # 6 positive + 6 negative (`hoi_dataset.py:103`)
N_QUERY = 2  # [negative, positive] (`hoi_dataset.py:104-105`)


class BongardTTA:
    """Few-shot prompt TTA over Bongard-HOI tasks.

    ``learned_cls=True`` reproduces the reference's ``['X', 'X']`` learnable
    class-token mode; otherwise the fixed ``['True', 'False']`` names are used
    (`custom_clip.py:350-355`).
    """

    def __init__(
        self,
        clip_params,
        clip_cfg,
        ecfg: EpisodeConfig,
        ctx_init: Optional[str] = None,
        n_ctx: int = 4,
        learned_cls: bool = True,
        ctx0=None,
    ):
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.ecfg = ecfg
        self.ctx_init = ctx_init
        self.n_ctx = n_ctx
        self.learned_cls = learned_cls
        self.ctx0_override = ctx0
        self.prompt_state = None

    def setup(self):
        from ..core import prompt as P

        classnames = ["X", "X"] if self.learned_cls else ["True", "False"]
        self.prompt_state = P.build_prompt_state(
            self.clip_params,
            classnames,
            ctx_init=self.ctx_init,
            n_ctx=self.n_ctx,
            ctx0=self.ctx0_override,
            learned_cls=self.learned_cls,
        )
        pt = self.prompt_state
        cfg = self.clip_cfg
        ecfg = self.ecfg
        learned_cls = self.learned_cls

        pt_args = {"fixed_embed": pt.fixed_embed, "ctx_map": pt.ctx_map, "eot_idx": pt.eot_idx}
        if learned_cls:
            trainable0 = {"ctx": pt.ctx0, "cls": pt.cls0}
            pt_args["cls_mask"] = pt.cls_mask
        else:
            trainable0 = pt.ctx0
        self._pt_args = pt_args
        self._trainable0 = trainable0

        def text_features(cparams, trainable, pt_a):
            if learned_cls:
                prompts = P.splice_arrays(
                    trainable["ctx"], pt_a["fixed_embed"], pt_a["ctx_map"], trainable["cls"], pt_a["cls_mask"]
                )
            else:
                prompts = P.splice_arrays(trainable, pt_a["fixed_embed"], pt_a["ctx_map"])
            feats = clip_model.encode_text_embeds(cparams, cfg, prompts, pt_a["eot_idx"])
            return clip_model.normalize(feats.astype(jnp.float32))

        opt = make_optimizer(ecfg)

        @jax.jit
        def encode_images(cparams, images):
            """[M, H, W, 3] -> normalized features [M, E] (frozen tower)."""
            from .classification import maybe_normalize_u8

            images = maybe_normalize_u8(images)
            feats = clip_model.encode_image(cparams, cfg, images)
            return clip_model.normalize(feats.astype(jnp.float32))

        def one_episode(cparams, trainable0_, pt_a, sup_feats, sup_labels, q_feats):
            """(support [12, E], labels [12], queries [2, E]) -> (q_logits [2, 2], losses)."""
            scale = jnp.exp(cparams["logit_scale"]).astype(jnp.float32)
            one_hot = jax.nn.one_hot(sup_labels, 2, dtype=jnp.float32)

            def loss_fn(tr):
                tf = text_features(cparams, tr, pt_a)
                logits = scale * jnp.dot(sup_feats, tf.T, preferred_element_type=jnp.float32)
                return jnp.mean(optax.softmax_cross_entropy(logits, one_hot))

            def step(carry, _):
                tr, opt_state = carry
                loss, g = jax.value_and_grad(loss_fn)(tr)
                upd, opt_state = opt.update(g, opt_state, tr)
                return (optax.apply_updates(tr, upd), opt_state), loss

            (tr_t, _), losses = jax.lax.scan(
                step, (trainable0_, opt.init(trainable0_)), None, length=ecfg.tta_steps
            )
            tf_final = text_features(cparams, tr_t, pt_a)
            q_logits = scale * jnp.dot(q_feats, tf_final.T, preferred_element_type=jnp.float32)
            return q_logits, losses

        self._encode_images = encode_images
        self._episodes = jax.jit(jax.vmap(one_episode, in_axes=(None, None, None, 0, 0, 0)))
        return self

    def adapt_tasks(self, task_images, support_labels):
        """Run a batch of Bongard tasks.

        Args:
          task_images: [N, 14, H, W, 3] float (CLIP-normalized) or uint8 —
            support images 0..11, queries 12..13 ([neg_query, pos_query]).
          support_labels: [N, 12] int (0 = positive class, 1 = negative).

        Returns (query_logits [N, 2, 2], aux).
        """
        task_images = jnp.asarray(task_images)
        N = task_images.shape[0]
        flat = task_images.reshape((N * (N_SUPPORT + N_QUERY),) + task_images.shape[2:])
        feats = self._encode_images(self.clip_params, flat)
        feats = feats.reshape(N, N_SUPPORT + N_QUERY, -1)
        sup_feats, q_feats = feats[:, :N_SUPPORT], feats[:, N_SUPPORT:]
        q_logits, losses = self._episodes(
            self.clip_params, self._trainable0, self._pt_args, sup_feats, jnp.asarray(support_labels), q_feats
        )
        return q_logits, {"losses": losses}


def run_bongard(args, params, cfg, logger) -> dict:
    """CLI driver: iterate ``BongardHOIDataset`` tasks, report query accuracy.

    Per-task accuracy is the mean over the two queries (labels ``[1, 0]``,
    `hoi_dataset.py:104-105`); the dataset-level number is the mean over all
    query predictions, as the reference's top-1 meter would produce.
    """
    from ..data.datasets import BongardHOIDataset
    from ..data.transforms import preprocess_pil

    ecfg = EpisodeConfig(
        tta_steps=args.tta_steps,
        selection_p=args.selection_p,
        lr=args.lr,
        weight_decay=args.weight_decay,
        loss="bongard_ce",
        sample_k=args.sample_k,
    )
    tta = BongardTTA(
        params,
        cfg,
        ecfg,
        ctx_init=args.ctx_init,
        n_ctx=args.n_ctx,
        learned_cls=bool(getattr(args, "learned_cls", 1)),
    ).setup()

    dataset = BongardHOIDataset(
        args.data, split=getattr(args, "bongard_split", "unseen_obj_unseen_act"), mode=args.dataset_mode
    )
    n_tasks = len(dataset) if args.limit is None else min(args.limit, len(dataset))

    support_labels = np.array([0] * 6 + [1] * 6, dtype=np.int32)  # `hoi_dataset.py:103`
    query_labels = np.array([1, 0], dtype=np.int32)  # `hoi_dataset.py:105`

    correct = total = 0
    group_imgs = []

    def flush():
        nonlocal correct, total
        if not group_imgs:
            return
        batch = np.stack(group_imgs)  # [N, 14, H, W, 3]
        labels = np.tile(support_labels, (batch.shape[0], 1))
        q_logits, _ = tta.adapt_tasks(batch, labels)
        preds = np.argmax(np.asarray(q_logits), axis=-1)  # [N, 2]
        correct += int((preds == query_labels[None, :]).sum())
        total += preds.size
        group_imgs.clear()

    for i in range(n_tasks):
        task = dataset[i]
        # Static [12 support + 2 query] layout: 6 per polarity like the
        # reference's fixed label vector (`hoi_dataset.py:103`); short tasks
        # pad by repetition so batched episodes keep one compiled shape.
        pos_s = (task["pos_support"] * 6)[:6]
        neg_s = (task["neg_support"] * 6)[:6]
        imgs = pos_s + neg_s + [task["neg_query"], task["pos_query"]]
        group_imgs.append(np.stack([preprocess_pil(im, args.resolution) for im in imgs]))
        if len(group_imgs) == args.episode_group:
            flush()
    flush()

    acc = 100.0 * correct / max(total, 1)
    result = {"top1": round(acc, 2), "n_tasks": n_tasks, "n_queries": total}
    logger.text(f"=> Bongard-HOI [{getattr(args, 'bongard_split', 'unseen_obj_unseen_act')}]: @1 {result['top1']}")
    return result
