"""CLI entry points end to end on synthetic data (tiny archs, CPU)."""

import json
import os

import numpy as np
import pytest


def test_zero_shot_cli(tmp_path):
    from rlcf_tpu.cli import zero_shot

    r = zero_shot.main(
        ["--test_sets", "synthetic", "--limit", "8", "--arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--batch_size", "4",
         "--output", str(tmp_path)]
    )
    assert "synthetic" in r and 0 <= r["synthetic"]["top1"] <= 100
    assert (tmp_path / "results.json").exists()


@pytest.mark.slow
def test_tta_cls_cli_with_resume(tmp_path):
    from rlcf_tpu.cli import tta_cls

    args = [".", "--test_sets", "synthetic", "--limit", "4", "--arch", "test-small",
            "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
            "--batch_size", "6", "--tta_steps", "1", "--sample_k", "2",
            "--ctx_init", "a_photo_of_a", "--episode_group", "2", "--output", str(tmp_path)]
    r1 = tta_cls.main(args)
    journal = tmp_path / "progress_synthetic.jsonl"
    assert journal.exists()
    lines = journal.read_text().strip().split("\n")
    assert sum(json.loads(l)["n"] for l in lines) == 4
    # resume: all 4 already scored -> identical summary without re-running
    r2 = tta_cls.main(args + ["--resume"])
    assert r2["synthetic"] == r1["synthetic"]


def test_tta_retrieval_cli(tmp_path):
    from rlcf_tpu.cli import tta_retrieval

    r = tta_retrieval.main(
        ["--synthetic", "--arch", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--tta_steps", "1",
         "--sample_k", "2", "--group_size", "2", "--output", str(tmp_path)]
    )
    assert set(r) >= {"txt_r1", "img_r1", "r_mean"}
    assert (tmp_path / "results_retrieval.json").exists()


def test_train_caption_cli(tmp_path):
    from rlcf_tpu.cli import train_caption

    losses = train_caption.main(
        ["--synthetic", "--epochs", "2", "--arch", "test-small",
         "--precision", "fp32", "--output", str(tmp_path)]
    )
    assert len(losses) == 2
    assert (tmp_path / "ckpt-latest.npz").exists()


def test_tta_caption_cli(tmp_path):
    from rlcf_tpu.cli import tta_caption

    r = tta_caption.main(
        ["--synthetic", "--limit", "2", "--tta_steps", "1", "--sample_k", "2",
         "--clip_model_type", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--output", str(tmp_path)]
    )
    assert len(r) == 2
    assert (tmp_path / "caption_trace.txt").exists()
    assert (tmp_path / "results_caption.json").exists()


def test_tta_cls_cli_native_token_path(tmp_path, monkeypatch):
    """--viewgen native on a ViT policy takes the patch-major token path —
    and really does (a pre-setup token_ok check once silently downgraded to
    the NHWC path because _prepare_tokens only exists after setup())."""
    from rlcf_tpu.data import native

    if not native.available():
        pytest.skip("no native toolchain")
    from rlcf_tpu.cli import tta_cls

    used = {}
    orig = native.generate_views_native_patch_u8

    def spy(*a, **k):
        used["tokens"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native, "generate_views_native_patch_u8", spy)
    r = tta_cls.main(
        [".", "--test_sets", "synthetic", "--limit", "2", "--arch", "test-small",
         "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--batch_size", "4", "--tta_steps", "1", "--sample_k", "2",
         "--ctx_init", "a_photo_of_a", "--episode_group", "2", "--viewgen", "native",
         "--output", str(tmp_path)]
    )
    assert 0 <= r["synthetic"]["top1"] <= 100
    assert used.get("tokens"), "patch-major token path did not engage"


@pytest.mark.slow
def test_tta_caption_dataset_mode_ids(tmp_path):
    """--dataset_mode 0 extracts integer COCO ids and path-keys clipscore json
    (`caption/image_llm/datasets/coco_cap.py:239-247`)."""
    import json as _json

    from PIL import Image
    from rlcf_tpu.cli import tta_caption
    from rlcf_tpu.cli.tta_caption import _synthetic_tokenizer

    tok = _synthetic_tokenizer(str(tmp_path / "tok"))
    img_dir = tmp_path / "imgs" / "val2014"
    img_dir.mkdir(parents=True)
    arr = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    Image.fromarray(arr).save(img_dir / "COCO_val2014_000000000042.jpg")
    ann = [{"image": "val2014/COCO_val2014_000000000042.jpg", "caption": ["a thing"]}]
    ann_p = tmp_path / "ann.json"
    ann_p.write_text(_json.dumps(ann))

    tta_caption.main(
        ["--annotations", str(ann_p), "--images_root", str(tmp_path / "imgs"),
         "--dataset_mode", "0", "--llm", "test-tiny-opt",
         "--opt_vocab", str(tmp_path / "tok" / "vocab.json"),
         "--opt_merges", str(tmp_path / "tok" / "merges.txt"),
         "--clip_model_type", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--tta_steps", "1",
         "--sample_k", "2", "--prefix_length", "4", "--clip_length", "2",
         "--output", str(tmp_path / "out")]
    )
    results = _json.load(open(tmp_path / "out" / "results_caption.json"))
    assert results[0]["image_id"] == 42
    cs = _json.load(open(tmp_path / "out" / "results_clipscore.json"))
    assert list(cs.keys()) == ["COCO_val2014_000000000042.jpg"]


@pytest.mark.slow
def test_tta_cls_cli_tp_mesh(tmp_path):
    """--tp 2 runs the sharded classifier on the virtual 8-device mesh."""
    from rlcf_tpu.cli import tta_cls

    r = tta_cls.main(
        [".", "--test_sets", "synthetic", "--limit", "4", "--arch", "test-small",
         "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--batch_size", "4", "--tta_steps", "1", "--sample_k", "2", "--tp", "2",
         "--ctx_init", "a_photo_of_a", "--episode_group", "4", "--output", str(tmp_path)]
    )
    assert 0 <= r["synthetic"]["top1"] <= 100


@pytest.mark.slow
def test_tta_retrieval_cli_tp_mesh(tmp_path):
    """--tp 2 runs the gallery-sharded retrieval path on the virtual mesh."""
    from rlcf_tpu.cli import tta_retrieval

    r = tta_retrieval.main(
        ["--synthetic", "--arch", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--tta_steps", "1",
         "--sample_k", "2", "--group_size", "2", "--tp", "2",
         "--output", str(tmp_path)]
    )
    assert set(r) >= {"txt_r1", "img_r1", "r_mean"}


@pytest.mark.slow
def test_tta_cls_cli_kd_loss(tmp_path):
    """--loss kd/dkd distills the reward logits through the same episode."""
    from rlcf_tpu.cli import tta_cls

    for loss in ("kd", "dkd"):
        r = tta_cls.main(
            [".", "--test_sets", "synthetic", "--limit", "2", "--arch", "test-small",
             "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
             "--batch_size", "4", "--tta_steps", "1", "--sample_k", "2", "--loss", loss,
             "--ctx_init", "a_photo_of_a", "--episode_group", "2",
             "--output", str(tmp_path / loss)]
        )
        assert 0 <= r["synthetic"]["top1"] <= 100


@pytest.mark.slow
def test_tune_cls_cli(tmp_path):
    """Encoder-TTA entry end to end (norm-only tuning + momentum EMA)."""
    from rlcf_tpu.cli import tune_cls

    r = tune_cls.main(
        [".", "--test_sets", "synthetic", "--limit", "2", "--arch", "test-small",
         "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--batch_size", "4", "--tta_steps", "1", "--lr", "1e-5", "--sample_k", "2",
         "--tune_norm", "1", "--momentum_update", "1", "--update_freq", "2",
         "--episode_group", "1", "--output", str(tmp_path)]
    )
    assert 0 <= r["synthetic"]["top1"] <= 100


def test_export_serving_cli(tmp_path):
    """AOT export entry produces a loadable artifact (token input)."""
    from rlcf_tpu.cli import export_serving
    from rlcf_tpu.utils.export import load_exported

    out = tmp_path / "ep.rlcfx"
    export_serving.main(
        ["--test_sets", "synthetic", "--arch", "test-small", "--reward_arch", "test-small",
         "--precision", "fp32", "--resolution", "64", "--batch_size", "4",
         "--episode_group", "2", "--tta_steps", "1", "--sample_k", "2",
         "--ctx_init", "a_photo_of_a", "--input", "tokens", "--out", str(out)]
    )
    assert out.exists() and out.stat().st_size > 100
    assert callable(load_exported(str(out)))


@pytest.mark.slow
def test_tta_cls_cli_cocoop(tmp_path):
    """--cocoop runs the image-conditioned prompt path end to end."""
    from rlcf_tpu.cli import tta_cls

    r = tta_cls.main(
        [".", "--test_sets", "synthetic", "--limit", "2", "--arch", "test-small",
         "--reward_arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--batch_size", "4", "--tta_steps", "1", "--sample_k", "2", "--cocoop",
         "--ctx_init", "a_photo_of_a", "--episode_group", "2", "--output", str(tmp_path)]
    )
    assert 0 <= r["synthetic"]["top1"] <= 100


def _tiny_tok_files(d):
    import json as _json

    from rlcf_tpu.tokenizer_gpt2 import _byte_to_unicode

    d.mkdir(parents=True, exist_ok=True)
    b2u = _byte_to_unicode()
    vocab = {"<pad>": 1, "</s>": 2}
    nid = 4
    for ch in b2u.values():
        if ch not in vocab:
            vocab[ch] = nid
            nid += 1
    (d / "vocab.json").write_text(_json.dumps(vocab))
    (d / "merges.txt").write_text("#version\n")
    return str(d / "vocab.json"), str(d / "merges.txt")


def test_clipscore_eval_cli(tmp_path):
    """CLIPScore + reference metrics end to end with --out_json."""
    import json as _json

    from PIL import Image
    from rlcf_tpu.cli import clipscore_eval

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cands, refs = {}, {}
    for i in range(2):
        name = f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / name)
        cands[name] = f"a photo of thing {i}"
        refs[name] = [f"thing {i} in a photo"]
    (tmp_path / "c.json").write_text(_json.dumps(cands))
    (tmp_path / "r.json").write_text(_json.dumps(refs))
    out = clipscore_eval.main(
        [str(tmp_path / "c.json"), str(img_dir), "--references_json", str(tmp_path / "r.json"),
         "--arch", "test-small", "--resolution", "64", "--precision", "fp32",
         "--out_json", str(tmp_path / "m.json")]
    )
    assert "clipscore" in out and "ref_clipscore" in out and "cider" in out
    saved = _json.loads((tmp_path / "m.json").read_text())
    assert saved["n_images"] == 2 and "meteor_mode" in saved


def test_extract_features_cli(tmp_path):
    """Feature pre-extractor writes tokens/masks/embeddings npz."""
    import json as _json

    from PIL import Image
    from rlcf_tpu.cli import extract_features

    vocab, merges = _tiny_tok_files(tmp_path / "tok")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / "a.jpg")
    ann = [{"image": "a.jpg", "caption": ["a tiny caption", "another one"]}]
    (tmp_path / "ann.json").write_text(_json.dumps(ann))
    out = tmp_path / "feats.npz"
    extract_features.main(
        ["--annotations", str(tmp_path / "ann.json"), "--images_root", str(img_dir),
         "--arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--opt_vocab", vocab, "--opt_merges", merges,
         "--prefix_length", "4", "--token_len", "8", "--out", str(out)]
    )
    data = np.load(out, allow_pickle=True)
    assert data["tokens"].shape == (2, 8)
    assert data["mask"].shape == (2, 12)  # prefix 4 + tokens 8
    assert data["image_embeddings"].shape[0] == 2
