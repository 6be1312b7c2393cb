"""Sharded streaming feature store (lmdb-extractor parity,
`caption/tools/extractor_lmdb.py:20-90`): bounded-memory write + epoch reads."""

import json

import numpy as np
import pytest

from rlcf_tpu.data.sharded_embeddings import ShardWriter, ShardedEmbeddings, is_sharded


def _write(base, n=25, shard_size=10, chunk=7, dim=4):
    w = ShardWriter(str(base), shard_size=shard_size)
    for s in range(0, n, chunk):
        m = min(chunk, n - s)
        w.append({
            "emb": np.arange(s, s + m, dtype=np.float32)[:, None].repeat(dim, 1),
            "tokens": np.arange(s, s + m, dtype=np.int32)[:, None].repeat(3, 1),
        })
    return w.close()


def test_writer_shards_and_manifest(tmp_path):
    mpath = _write(tmp_path / "f", n=25, shard_size=10, chunk=7)
    man = json.loads(open(mpath).read())
    assert man["counts"] == [10, 10, 5]
    assert man["total"] == 25
    assert is_sharded(str(tmp_path / "f"))
    r = ShardedEmbeddings(str(tmp_path / "f"))
    assert len(r) == 25
    # rows preserved in order across chunk/shard boundaries
    np.testing.assert_array_equal(r.column("tokens")[:, 0], np.arange(25))


def test_reader_epoch_covers_all_rows_once(tmp_path):
    _write(tmp_path / "f", n=24, shard_size=10, chunk=9)
    r = ShardedEmbeddings(str(tmp_path / "f"))
    rng = np.random.default_rng(0)
    seen = []
    for emb, toks in r.batches(4, ("emb", "tokens"), rng=rng):
        assert emb.shape == (4, 4) and toks.shape == (4, 3)
        np.testing.assert_array_equal(emb[:, 0].astype(np.int32), toks[:, 0])
        seen.extend(toks[:, 0].tolist())
    assert sorted(seen) == list(range(24))  # every row exactly once

    # unshuffled, batch not dividing shard size: carry joins shards, drop_last
    seen2 = [t for _, t in r.batches(7, ("emb", "tokens"))]
    flat = np.concatenate(seen2)[:, 0]
    assert len(flat) == 21  # 24 rows -> 3 full batches of 7, tail dropped
    assert len(set(flat.tolist())) == 21


def test_writer_rejects_ragged_and_mismatched(tmp_path):
    w = ShardWriter(str(tmp_path / "g"), shard_size=10)
    w.append({"a": np.zeros(3), "b": np.zeros(3)})
    with pytest.raises(ValueError, match="keys"):
        w.append({"a": np.zeros(3)})
    with pytest.raises(ValueError, match="ragged"):
        w.append({"a": np.zeros(3), "b": np.zeros(2)})
    with pytest.raises(ValueError, match="positive"):
        ShardWriter(str(tmp_path / "h"), shard_size=0)


def test_extract_and_train_sharded_end_to_end(tmp_path):
    """extract_features --shard_size -> train_caption on the manifest."""
    import json as _json

    from PIL import Image
    from rlcf_tpu.cli import extract_features, train_caption
    from tests.test_cli import _tiny_tok_files

    vocab, merges = _tiny_tok_files(tmp_path / "tok")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(3):
        name = f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / name)
        ann.append({"image": name, "caption": [f"tiny cap {i}", f"other cap {i}"]})
    (tmp_path / "ann.json").write_text(_json.dumps(ann))
    out = tmp_path / "feats"
    extract_features.main(
        ["--annotations", str(tmp_path / "ann.json"), "--images_root", str(img_dir),
         "--arch", "test-small", "--precision", "fp32", "--resolution", "64",
         "--opt_vocab", vocab, "--opt_merges", merges, "--shard_size", "4",
         "--prefix_length", "4", "--token_len", "8", "--out", str(out)]
    )
    man = _json.loads((tmp_path / "feats.manifest.json").read_text())
    assert man["counts"] == [4, 2] and man["total"] == 6
    r = ShardedEmbeddings(str(out))
    assert r.load_shard(0)["image_embeddings"].shape[0] == 4

    losses = train_caption.main(
        ["--embeddings", str(out), "--cap_model", "ClipCap", "--llm", "test-tiny-opt",
         "--mapping_type", "mlp", "--prefix_length", "4", "--clip_length", "2",
         "--epochs", "2", "--train_batch_size", "2", "--warmup_steps", "2",
         "--output", str(tmp_path / "run")]
    )
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_npz_suffixed_path_resolves_to_sharded_store(tmp_path):
    """The extractor maps '--out feats.npz --shard_size N' to
    feats.manifest.json; the trainer must find the store from the same
    'feats.npz' path the user passed."""
    _write(tmp_path / "feats")  # manifest at feats.manifest.json
    p = str(tmp_path / "feats.npz")
    assert is_sharded(p)
    se = ShardedEmbeddings(p)
    assert se.total == 25
