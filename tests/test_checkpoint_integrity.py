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


def test_checkpoint_url_scheme():
    """URLs are digest-addressed exactly like the reference's _MODELS table
    (`TPT/clip/clip.py:29-40`)."""
    url = Cv.clip_checkpoint_url("ViT-B/16")
    assert url == (
        "https://openaipublic.azureedge.net/clip/models/"
        "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt"
    )
    assert Cv.clip_checkpoint_url("ViT-L/14@336px").endswith("/ViT-L-14-336px.pt")
    with pytest.raises(ValueError, match="no released"):
        Cv.clip_checkpoint_url("not-an-arch")


def test_download_refuses_loudly_offline(tmp_path, monkeypatch):
    """Without egress the downloader must raise a clear error naming the URL
    and the manual fallback — never hang or return an unverified file."""
    import urllib.error
    import urllib.request

    def no_egress(url, timeout=None):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", no_egress)
    with pytest.raises(RuntimeError, match="openaipublic.azureedge.net.*ViT-B-16"):
        Cv.download_checkpoint("ViT-B/16", root=str(tmp_path))
    assert list(tmp_path.iterdir()) == []  # no partial files left behind


def test_download_reuses_verified_file_and_verifies_fresh(tmp_path, monkeypatch):
    """An existing file with the right digest short-circuits; a fresh download
    is SHA256-verified before being trusted (`TPT/clip/clip.py:53-70`)."""
    import io
    import urllib.request

    payload = b"fake checkpoint bytes"
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(Cv.CLIP_CHECKPOINT_SHA256, "RN50", digest)

    calls = []

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        return FakeResp(payload)

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    path = Cv.download_checkpoint("RN50", root=str(tmp_path))
    assert open(path, "rb").read() == payload
    assert calls == [Cv.clip_checkpoint_url("RN50")]
    # second call: digest matches -> no network touch
    assert Cv.download_checkpoint("RN50", root=str(tmp_path)) == path
    assert len(calls) == 1
    # corrupted file -> re-downloaded and re-verified
    with open(path, "wb") as fh:
        fh.write(b"corrupted")
    with pytest.warns(UserWarning, match="re-downloading"):
        Cv.download_checkpoint("RN50", root=str(tmp_path))
    assert open(path, "rb").read() == payload
    assert len(calls) == 2
    # server returning wrong bytes -> verification failure, file removed
    monkeypatch.setitem(Cv.CLIP_CHECKPOINT_SHA256, "RN50", "0" * 64)
    with open(path, "wb") as fh:
        fh.write(b"corrupted")
    with pytest.raises(RuntimeError, match="SHA256"), pytest.warns(UserWarning):
        Cv.download_checkpoint("RN50", root=str(tmp_path))
