"""Class metadata, transforms, datasets, and zero-shot eval plumbing."""

import numpy as np
import jax
import pytest

from rlcf_tpu.data import class_names as cn
from rlcf_tpu.data.datasets import SyntheticDataset, build_dataset, iter_batches
from rlcf_tpu.data.transforms import preprocess_pil, CLIP_MEAN, CLIP_STD
from rlcf_tpu.metrics.classification import AccuracyMeter, topk_correct
from rlcf_tpu.models import clip as C
from rlcf_tpu.tasks.classification import compute_class_features, zero_shot_eval


def test_class_metadata_counts():
    assert len(cn.imagenet_classes()) == 1000
    assert len(cn.imagenet_templates()) == 80
    assert len(cn.get_classnames("A")) == 200
    assert len(cn.get_classnames("R")) == 200
    assert len(cn.get_classnames("V")) == 1000
    assert len(cn.get_classnames("I")) == 1000
    assert cn.get_classnames("bongard") == ["True", "False"]
    assert len(cn.get_classnames("flower102")) == 102
    assert len(cn.get_classnames("dtd")) == 47


def test_assemble_prompts():
    prompts = cn.assemble_prompts(["golden_retriever", "tabby cat"], "a_photo_of_a")
    assert prompts == ["a photo of a golden retriever.", "a photo of a tabby cat."]


def test_preprocess_shapes_and_range():
    img = np.random.default_rng(0).integers(0, 256, (300, 400, 3), dtype=np.uint8)
    out = preprocess_pil(img, 224)
    assert out.shape == (224, 224, 3)
    # white pixel normalizes to (1 - mean) / std
    white = preprocess_pil(np.full((256, 256, 3), 255, np.uint8), 224)
    np.testing.assert_allclose(white[0, 0], (1.0 - CLIP_MEAN) / CLIP_STD, rtol=1e-5)


def test_topk_correct():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    counts = topk_correct(logits, labels, ks=(1, 2))
    assert int(counts[1]) == 1  # first correct at top-1
    assert int(counts[2]) == 1  # second's label is rank 2 (0-indexed top-2 misses)
    meter = AccuracyMeter(ks=(1, 2))
    meter.update(logits, labels)
    assert meter.summary() == {"top1": 50.0, "top2": 50.0}


def test_synthetic_dataset_and_batches():
    ds = build_dataset("synthetic", data_root="/nonexistent")
    assert len(ds) == 64
    img, label = ds[0]
    assert img.dtype == np.uint8 and img.shape == (256, 256, 3)
    batches = list(iter_batches(ds, batch_size=16, resolution=64, limit=32))
    assert len(batches) == 2
    assert batches[0][0].shape == (16, 64, 64, 3)


def test_zero_shot_eval_runs_and_is_sane():
    """With a contrived 'model' whose class features equal image features of
    each class, accuracy should be 100%; here we just assert the pipeline runs
    end-to-end on a tiny model and produces the metric dict."""
    cfg = C.get_config("test-tiny-vit")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    ds = SyntheticDataset(n=8, n_classes=4, size=64)
    result = zero_shot_eval(params, cfg, ds, ["a", "b", "c", "d"], batch_size=4, resolution=cfg.image_resolution)
    assert set(result) == {"top1", "top5"}
    assert 0.0 <= result["top1"] <= 100.0


def test_class_features_shape_and_norm():
    cfg = C.get_config("test-tiny-vit")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    feats = compute_class_features(params, cfg, ["cat", "dog", "bird"])
    assert feats.shape == (3, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)
