"""Checkpoint SHA256 integrity gates (`TPT/clip/clip.py:53-70`)."""

import hashlib
import types

import numpy as np
import pytest

from rlcf_tpu.models import convert as Cv


def test_strict_verify_raises_on_corrupt_file(tmp_path):
    """A file claiming to be a stock release but with a wrong digest fails."""
    bad = tmp_path / "ViT-B-16.pt"
    bad.write_bytes(b"corrupt bytes, definitely not the released checkpoint")
    assert not Cv.verify_checkpoint_sha256(str(bad), "ViT-B/16")
    with pytest.raises(RuntimeError, match="SHA256"):
        Cv.load_clip_checkpoint(str(bad), verify_arch="ViT-B/16")


def test_digest_classification(tmp_path, monkeypatch):
    f = tmp_path / "ckpt.pt"
    f.write_bytes(b"some fine-tuned checkpoint")
    digest = hashlib.sha256(b"some fine-tuned checkpoint").hexdigest()

    status, detail = Cv.check_checkpoint_digest(str(f), "ViT-B/16")
    assert status == "unknown" and detail == digest

    # a file whose digest matches a different stock release is classified so
    monkeypatch.setitem(Cv.CLIP_CHECKPOINT_SHA256, "RN50", digest)
    status, detail = Cv.check_checkpoint_digest(str(f), "ViT-B/16")
    assert (status, detail) == ("wrong-arch", "RN50")
    status, _ = Cv.check_checkpoint_digest(str(f), "RN50")
    assert status == "ok"


def test_load_policy_rejects_wrong_arch_stock_file(tmp_path, monkeypatch):
    """CLI path: passing the RN50 release to --arch ViT-B/16 must refuse."""
    from rlcf_tpu.cli import common

    f = tmp_path / "RN50.pt"
    f.write_bytes(b"pretend stock rn50")
    digest = hashlib.sha256(b"pretend stock rn50").hexdigest()
    monkeypatch.setitem(Cv.CLIP_CHECKPOINT_SHA256, "RN50", digest)

    args = types.SimpleNamespace(
        arch="ViT-B/16", clip_checkpoint=str(f), precision="fp32",
        verify_checkpoint=1, seed=0,
    )
    with pytest.raises(RuntimeError, match="RN50"):
        common.load_policy(args)
