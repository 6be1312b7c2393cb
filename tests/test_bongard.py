"""Bongard-HOI few-shot prompt TTA: episode learning, loader, CLI.

Reference semantics: `TPT/data/hoi_dataset.py:26-115` (task layout, fixed
seed-0 shuffle, 6+6 support / 2 queries, labels pos=0) and
`TPT/clip/custom_clip.py:347-361` (2-class learned-cls prompt learner).
"""

import json
import os

import numpy as np
import pytest

import jax

from rlcf_tpu.core.episode import EpisodeConfig
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.bongard import BongardTTA


def tiny_cfg(name="tiny-bongard", res=32, patch=16):
    return C.ClipConfig(name, 16, res, 1, 32, patch, 32, 1, vision_heads_override=2, text_heads_override=2)


def make_task_images(n_tasks=2, res=32, seed=0):
    """Pos images: bright with a vertical stripe; neg: dark noise.

    Layout matches BongardTTA.adapt_tasks: [12 support (6 pos, 6 neg), 2
    queries (neg, pos)] per task, CLIP-normalized-ish floats.
    """
    r = np.random.default_rng(seed)

    def pos():
        img = r.normal(1.5, 0.1, size=(res, res, 3))
        img[:, res // 2 - 2 : res // 2 + 2] = 3.0
        return img

    def neg():
        return r.normal(-1.0, 0.1, size=(res, res, 3))

    tasks = []
    for _ in range(n_tasks):
        imgs = [pos() for _ in range(6)] + [neg() for _ in range(6)] + [neg(), pos()]
        tasks.append(np.stack(imgs))
    return np.stack(tasks).astype(np.float32)


@pytest.mark.parametrize("learned_cls", [True, False])
@pytest.mark.slow
def test_bongard_episode_learns(learned_cls):
    cfg = tiny_cfg()
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    ecfg = EpisodeConfig(tta_steps=20, lr=0.05, weight_decay=0.0)
    tta = BongardTTA(params, cfg, ecfg, learned_cls=learned_cls, n_ctx=2).setup()

    imgs = make_task_images(n_tasks=2)
    labels = np.tile(np.array([0] * 6 + [1] * 6, dtype=np.int32), (2, 1))
    q_logits, aux = tta.adapt_tasks(imgs, labels)
    q_logits = np.asarray(q_logits)

    assert q_logits.shape == (2, 2, 2)
    assert np.isfinite(q_logits).all()
    # support CE must decrease (the prompt learns the task)
    losses = np.asarray(aux["losses"])
    assert losses.shape == (2, 20)
    assert losses[:, -1].mean() < losses[:, 0].mean()
    # queries: index 0 is the negative query (class 1), index 1 positive (class 0).
    # Only the learned-cls mode has class-separating trainables (the ctx is
    # shared across both classes), so exact query predictions are asserted
    # there; the fixed-name mode just has to optimize.
    if learned_cls:
        preds = q_logits.argmax(-1)
        np.testing.assert_array_equal(preds, np.tile(np.array([1, 0]), (2, 1)))


def _write_fake_bongard_root(root, n_tasks=2, res=48):
    from PIL import Image

    img_dir = os.path.join(root, "imgs")
    split_dir = os.path.join(root, "data", "bongard_splits")
    os.makedirs(img_dir), os.makedirs(split_dir)
    r = np.random.default_rng(0)
    tasks = []
    for t in range(n_tasks):
        neg_items, pos_items = [], []
        for i in range(7):
            for polarity, items in (("neg", neg_items), ("pos", pos_items)):
                base = 30 if polarity == "neg" else 220
                arr = np.clip(r.normal(base, 10, size=(res, res, 3)), 0, 255).astype(np.uint8)
                rel = f"imgs/{polarity}_{t}_{i}.jpg"
                Image.fromarray(arr).save(os.path.join(root, rel))
                items.append({"im_path": rel})
        tasks.append([neg_items, pos_items, f"ride++horse_{t}"])
    path = os.path.join(split_dir, "bongard_hoi_test_unseen_obj_unseen_act.json")
    with open(path, "w") as fh:
        json.dump(tasks, fh)


def test_bongard_dataset_loader(tmp_path):
    from rlcf_tpu.data.datasets import BongardHOIDataset

    _write_fake_bongard_root(str(tmp_path))
    ds = BongardHOIDataset(str(tmp_path))
    assert len(ds) == 2
    task = ds[0]
    assert len(task["pos_support"]) == 6 and len(task["neg_support"]) == 6
    assert task["pos_query"].shape[-1] == 3
    assert task["annotation"] == "ride horse_0"
    # deterministic shuffle (seed 0, `hoi_dataset.py:84-86`)
    task2 = ds[0]
    np.testing.assert_array_equal(task["pos_query"], task2["pos_query"])


@pytest.mark.slow
def test_bongard_cli(tmp_path):
    from rlcf_tpu.cli import tta_cls

    data_root = tmp_path / "data"
    data_root.mkdir()
    _write_fake_bongard_root(str(data_root))
    r = tta_cls.main(
        [str(data_root), "--test_sets", "bongard", "--arch", "test-small",
         "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--tta_steps", "2", "--episode_group", "2", "--limit", "2",
         "--output", str(tmp_path / "out")]
    )
    assert "bongard" in r
    assert 0.0 <= r["bongard"]["top1"] <= 100.0
    assert r["bongard"]["n_queries"] == 4
