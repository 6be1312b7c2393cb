"""Benchmark: flagship RLCF prompt-TTA throughput (images/sec/chip).

Measures the reference's headline workload (`TPT/scripts/rlcf-prompt.sh`
config: ViT-B/16 policy, ViT-L/14 frozen reward, 64 AugMix views/sample,
selection_p=0.1, sample_k=3, tta_steps=3, 200 ImageNet-A classes) end to end
on one chip: view generation + jitted vmapped REINFORCE episodes.

Weights are randomly initialized (no checkpoint egress in this environment);
throughput is weight-independent.

View generation backend (BENCH_VIEWGEN):
- "fused" (default; alias "device-matmul"): the fully-fused Pallas AugMix
  kernel (`ops/pallas_augmix.py`) — ships the 196 KB u8 source image, builds
  all 64 views in VMEM (RRC as MXU matmuls, real per-op branching,
  bit-sliced MXU equalize), emits patch-major u8 tokens. ~0.2 ms/image on
  this chip: the host+wire viewgen term is gone and the bench reads the
  episode roofline.
- "native": round-2 path — C++ AugMix on host threads overlapped with
  device episodes (kept for comparison/regression).
- "device": the round-1 jitted XLA pipeline (vector-op-bound; ~100x slow on
  this axon environment, fine on real VPUs).

Baseline: the reference's per-sample A100 PyTorch throughput for this
config. The reference publishes no numbers, so the baseline is a DERIVED
OPTIMISTIC BOUND (tools/baseline_roofline.py, written into BASELINE.md):
15.3 TFLOPs/image through the reference's exact step structure at generous
per-phase eager-fp16 efficiencies + its serialized host syncs = 134 ms/img
-> 7.45 img/s. Real eager PyTorch will run slower, so vs_baseline is a
LOWER bound on the true speedup (chip vs chip, v5e 197 TF vs A100 312 TF).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import queue
import sys
import threading
import time

import numpy as np

BASELINE_IMG_PER_SEC = 7.45  # tools/baseline_roofline.py derived bound


def _arm_init_watchdog(timeout_s: float) -> threading.Event:
    """Abort instead of hanging if the device backend never initializes.

    On this environment the TPU is reached through a tunnel; when the tunnel
    is wedged, the first `jax.devices()` blocks FOREVER (the interpreter and
    `import jax` are fine — only backend init hangs). A hung bench is worse
    than a failed one: the caller gets no JSON, no exit, no diagnostics. The
    watchdog gives init a generous budget, then exits 3 with a message on
    stderr and no stdout JSON (so a wedged run can never be recorded as a
    0-throughput regression).
    """
    ready = threading.Event()

    def bark():
        if not ready.wait(timeout_s):
            print(
                f"# bench watchdog: device backend failed to initialize within "
                f"{timeout_s:.0f}s (TPU tunnel wedged?) — aborting instead of hanging. "
                "Set BENCH_INIT_TIMEOUT_S to adjust.",
                file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=bark, daemon=True).start()
    return ready


def main():
    backend_ready = _arm_init_watchdog(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600")))

    import jax
    import jax.numpy as jnp

    from rlcf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from rlcf_tpu.models import clip as C
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.core.episode import EpisodeConfig
    from rlcf_tpu.tasks.classification import PromptTTAClassifier
    from rlcf_tpu.data.class_names import get_classnames

    n_devices = len(jax.devices())
    backend_ready.set()  # device backend is up; disarm the init watchdog
    n_views = int(os.environ.get("BENCH_VIEWS", 64))
    group = int(os.environ.get("BENCH_GROUP", max(4, 2 * n_devices)))
    iters = int(os.environ.get("BENCH_ITERS", 24))
    backend = os.environ.get("BENCH_VIEWGEN", "fused")
    if backend == "device-matmul":
        backend = "fused"
    if backend == "fused" and jax.default_backend() != "tpu":
        backend = "device"
        print(f"# BENCH_VIEWGEN=fused needs a TPU; falling back to {backend}", file=sys.stderr)
    dtype = jnp.bfloat16

    # Multi-chip: shard the episode group over a dp mesh (episodes are
    # embarrassingly parallel); single chip: no-op.
    if n_devices > 1:
        from rlcf_tpu.parallel.mesh import episode_shardings, make_mesh

        mesh = make_mesh()
        data_sharding, _ = episode_shardings(mesh)
        shard = lambda v: jax.device_put(jnp.asarray(v), data_sharding)
        print(f"# mesh: dp={n_devices}", file=sys.stderr)
    else:
        mesh = None
        shard = lambda v: v

    pcfg = C.get_config("ViT-B/16")
    rcfg = C.get_config("ViT-L/14")
    t0 = time.time()
    pparams = jax.jit(lambda k: C.init_clip_params(k, pcfg, dtype=dtype))(jax.random.PRNGKey(0))
    rparams = jax.jit(lambda k: C.init_clip_params(k, rcfg, dtype=dtype))(jax.random.PRNGKey(1))
    jax.block_until_ready(pparams)
    jax.block_until_ready(rparams)
    print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)

    reward = ClipReward(rparams, rcfg, RewardConfig(sample_k=3))
    ecfg = EpisodeConfig(tta_steps=3, selection_p=0.1, lr=7e-3, sample_k=3)
    clf = PromptTTAClassifier(pparams, pcfg, reward, ecfg, ctx_init="a photo of a", mesh=mesh)
    t0 = time.time()
    clf.setup(get_classnames("A"))  # 200 classes, the ImageNet-A flagship set
    print(f"# setup {time.time()-t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (group, 256, 256, 3), dtype=np.uint8)

    from rlcf_tpu.data.augment import make_view_generator

    gen = make_view_generator(n_views=n_views, resolution=224)

    def make_views_device(seed):
        return gen(jnp.asarray(imgs), jax.random.split(jax.random.PRNGKey(seed), group))

    def setup_viewgen(backend):
        """(make_tokens_fused, make_views_host) for a backend choice."""
        if backend == "fused":
            from rlcf_tpu.ops.pallas_augmix import fused_views, fused_views_sharded

            imgs_planar = jnp.asarray(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
            p_pol, p_rew = pcfg.vision_patch_size, rcfg.vision_patch_size
            reward_same_res = rcfg.is_vit and rcfg.image_resolution == 224
            fkw = dict(n_views=n_views, resolution=224, src_size=256,
                       p_policy=p_pol, p_reward=p_rew if reward_same_res else 0)

            def make_tokens_fused(seed):
                keys = jax.random.split(jax.random.PRNGKey(seed), group)
                if mesh is not None and group % mesh.shape["dp"] == 0:
                    # multi-chip: viewgen shards over dp with the episodes
                    return fused_views_sharded(imgs_planar, keys, mesh, **fkw)
                return fused_views(imgs_planar, keys, **fkw)

            return make_tokens_fused, None
        if backend == "native" and n_devices > 1:
            # Multi-chip dp shards rank-5 view batches; keep the NHWC u8 path there.
            from rlcf_tpu.data.native import generate_views_native_u8

            def make_views_host(seed):
                return generate_views_native_u8(imgs, n_views=n_views, resolution=224, seed=seed)

            return None, make_views_host
        if backend == "native":
            # Patch-major u8 tokens: views ship pre-patchified for both towers
            # ([., p^2*3]-minor layouts ride the fast transfer path and feed the
            # patch-embed matmul directly; the [., 3]-minor image layout tile-pads
            # 42x costing ~0.8s/group in transfer or on-device relayout).
            from rlcf_tpu.data.native import generate_views_native_patch_u8

            p_pol = pcfg.vision_patch_size

            def make_views_host(seed):
                # policy tokens only: the reward's few selected views are
                # depatchified on device (S << B), halving the host emit cost
                return generate_views_native_patch_u8(
                    imgs, n_views=n_views, p_policy=p_pol, resolution=224, seed=seed
                )

            return None, make_views_host
        return None, None

    make_tokens_fused, make_views_host = setup_viewgen(backend)
    if backend == "fused":
        # Insurance for the recorded headline number: if the Pallas kernel
        # stops compiling on a changed runtime, fall back to the round-2
        # native-host path instead of crashing the bench.
        try:
            jax.block_until_ready(
                t[0] if isinstance((t := make_tokens_fused(-1)), tuple) else t)
        except Exception as e:  # Mosaic/runtime regression
            print(f"# fused viewgen failed ({type(e).__name__}: {e}); "
                  "falling back to BENCH_VIEWGEN=native", file=sys.stderr)
            backend = "native"
            make_tokens_fused, make_views_host = setup_viewgen(backend)

    def run_group(v):
        if isinstance(v, tuple):  # patch-major token pair
            return clf.adapt_tokens(v[0], v[1])
        if not isinstance(v, tuple) and getattr(v, "ndim", 5) == 4:  # policy tokens
            return clf.adapt_tokens(v)
        return clf.adapt(shard(v))

    # compile / warm up; time a full device-generated group so the hybrid
    # loop knows what a fallback actually costs on this platform
    t0 = time.time()
    if backend == "fused":
        # Single-dispatch production path: viewgen + prepare + episodes in ONE
        # jitted program, RNG seed carried on device (each eager PRNGKey+split
        # plus the extra dispatches cost ~8 ms/img of tunnel round-trips at
        # group 4 — the r4 episode-vs-end-to-end gap).
        imgs_planar_src = jnp.asarray(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
        adapt_src = adapt_scan = imgs_all_dev = None
        try:
            # Scanned macro-batch: ALL iters groups (distinct images) in ONE
            # dispatch — per-call host work (pytree flatten of two CLIP towers
            # + tunnel dispatch, ~35 ms/group measured) amortizes to zero and
            # steady state reads the episode roofline.
            adapt_scan = clf.adapt_sources_scan_fn(n_views=n_views, src_size=256, resolution=224)
            imgs_all_dev = jnp.asarray(
                rng.integers(0, 256, (iters, group, 3, 256, 256), dtype=np.uint8))
            logits, _, seed_dev = adapt_scan(imgs_all_dev, 0)
            np.asarray(logits)
        except Exception as e:  # scan-path regression: degrade to the
            # single-dispatch-per-group path, then to the 3-dispatch token path
            print(f"# adapt_sources_scan_fn failed ({type(e).__name__}: {e}); "
                  "using the per-group single-dispatch path", file=sys.stderr)
            adapt_scan = None
            try:
                adapt_src = clf.adapt_sources_fn(n_views=n_views, src_size=256, resolution=224)
                logits, _, seed_dev = adapt_src(imgs_planar_src, 0)
                np.asarray(logits)
            except Exception as e2:
                print(f"# adapt_sources_fn failed ({type(e2).__name__}: {e2}); "
                      "using the 3-dispatch token path", file=sys.stderr)
                adapt_src = None
                toks = make_tokens_fused(0)
                logits, _ = clf.adapt_tokens(*toks) if isinstance(toks, tuple) else clf.adapt_tokens(toks)
                np.asarray(logits)
        t_dev_group = None
    else:
        views = make_views_device(0)
        logits, _ = clf.adapt(views)
        np.asarray(logits)
        t1 = time.time()
        logits, _ = clf.adapt(shard(make_views_device(1)))
        np.asarray(logits)
        t_dev_group = time.time() - t1
        if make_views_host is not None:
            views = make_views_host(0)
            logits, _ = run_group(views)
            np.asarray(logits)
    print(f"# compile+warmup {time.time()-t0:.0f}s"
          + (f" (device group: {t_dev_group:.1f}s)" if t_dev_group is not None else ""), file=sys.stderr)

    # Episode-only latency + MFU on device-resident inputs (the compute-path
    # number the end-to-end figure should be read against; analytic FLOPs,
    # v5e bf16 peak 197 TF/s). For the fused backend the resident input is
    # the token pair — prepare_tokens + episodes IS the production hot path.
    if backend == "fused":
        dtoks = make_tokens_fused(2)
        jax.block_until_ready(dtoks[0] if isinstance(dtoks, tuple) else dtoks)
        run_resident = (lambda: clf.adapt_tokens(*dtoks)) if isinstance(dtoks, tuple) else (
            lambda: clf.adapt_tokens(dtoks))
    else:
        dviews = jnp.asarray(make_views_device(2))
        jax.block_until_ready(dviews)
        run_resident = lambda: clf.adapt(dviews)
    ep_times = []
    for _ in range(5):
        te = time.time()
        lg, _ = run_resident()
        np.asarray(lg)
        ep_times.append(time.time() - te)
    episode_s = float(np.median(ep_times))

    # Analytic FLOP count (XLA's cost_analysis() under-reports convs/dots on
    # this backend): standard transformer accounting, 2 FLOPs per MAC,
    # backward = 2x forward.
    from rlcf_tpu.utils.flops import vit_flops, text_tower_flops as text_flops

    n_keep = max(1, int(n_views * ecfg.selection_p))
    t_pol = (224 // pcfg.vision_patch_size) ** 2 + 1
    t_rew = (rcfg.image_resolution // rcfg.vision_patch_size) ** 2 + 1
    n_cls, t_txt = clf.prompt_state.fixed_embed.shape[:2]
    f_policy = n_views * vit_flops(pcfg.vision_width, pcfg.vision_layers, t_pol,
                                   pcfg.vision_patch_size**2 * 3, pcfg.embed_dim)
    f_reward = n_keep * vit_flops(rcfg.vision_width, rcfg.vision_layers, t_rew,
                                  rcfg.vision_patch_size**2 * 3, rcfg.embed_dim)
    # per TTA step: text fwd+bwd (bwd ~ 2x fwd); +1 final fwd
    f_text = (3 * ecfg.tta_steps + 1) * text_flops(pcfg, n_cls * t_txt)
    flops_group = group * (f_policy + f_reward + f_text)
    mfu = flops_group / episode_s / (197e12)
    print(
        f"# episode-only: {episode_s/group*1e3:.1f} ms/img, "
        f"{flops_group/group/1e12:.2f} TFLOP/img, MFU {100*mfu:.1f}%",
        file=sys.stderr,
    )

    # Hybrid pipeline: a host thread produces view groups (C++ AugMix; the
    # ctypes call releases the GIL) while the consumer runs episodes. The mix
    # is SELF-BALANCING: whenever the host queue is empty, the consumer fills
    # the gap with a device-generated group and blocks on its result — the
    # block overlaps with host production, so a slow host (shared single core)
    # shifts work to the device and a fast host starves the device path out.
    t0 = time.time()
    done = 0
    host_groups = dev_groups = 0
    logits = None
    if backend == "fused" and adapt_scan is not None:
        # ONE dispatch for the whole steady run: lax.scan over iters groups of
        # distinct images, viewgen+prepare+episodes fused, seed chained inside
        logits, _, seed_dev = adapt_scan(imgs_all_dev, seed_dev)
        logits = logits[-1]
        done += iters * group
        dev_groups += iters
    elif backend == "fused" and adapt_src is not None:
        # whole pipeline is device-resident AND single-dispatch: one jitted
        # call per group, seed chained on device (dependent dispatches are
        # ~1 ms; host-made keys are ~90 ms of synchronous tunnel RTTs)
        for i in range(iters):
            logits, _, seed_dev = adapt_src(imgs_planar_src, seed_dev)
            done += group
            dev_groups += 1
    elif backend == "fused":
        for i in range(iters):
            toks = make_tokens_fused(i + 1)
            logits, _ = clf.adapt_tokens(*toks) if isinstance(toks, tuple) else clf.adapt_tokens(toks)
            done += group
            dev_groups += 1
    elif make_views_host is not None:
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for i in range(iters):
                q.put(make_views_host(i + 1))
            q.put(None)

        threading.Thread(target=producer, daemon=True).start()
        # Grace before falling back to a device-generated group adapts to the
        # observed host production rate AND the measured device-group cost: a
        # fallback only pays when the host has stalled for longer than the
        # device would take to produce+run the whole group itself (on this
        # platform's vector-op-slow device viewgen that is ~seconds, so the
        # fallback is a genuine emergency path, not a filler).
        finished = False
        host_gap = None
        last_host_t = time.time()
        while not finished:
            grace = max(t_dev_group, 1.0 if host_gap is None else 2.0 * host_gap)
            try:
                v = q.get(timeout=grace)
            except queue.Empty:
                # host starved -> one synchronous device-generated episode
                lg, _ = clf.adapt(shard(make_views_device(10_000 + dev_groups)))
                np.asarray(lg)  # block: host C++ keeps producing meanwhile
                logits = lg
                done += group
                dev_groups += 1
                continue
            if v is None:
                finished = True
                continue
            now = time.time()
            gap = now - last_host_t
            host_gap = gap if host_gap is None else 0.7 * host_gap + 0.3 * gap
            last_host_t = now
            logits, _ = run_group(v)
            done += group
            host_groups += 1
    else:
        for i in range(iters):
            logits, _ = clf.adapt(shard(make_views_device(i + 1)))
            done += group
            dev_groups += 1
    np.asarray(logits)  # drain
    dt = time.time() - t0
    img_per_sec = done / dt
    print(
        f"# steady {dt:.1f}s for {done} episodes "
        f"(viewgen={backend}+hybrid, host_groups={host_groups}, dev_groups={dev_groups})",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "rlcf_prompt_tta_throughput (ViT-B/16 policy, ViT-L/14 reward, 64 views, 3 steps, 200 classes)",
                "value": round(img_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
                "episode_ms_per_image": round(episode_s / group * 1e3, 1),
                "episode_tflop_per_image": round(flops_group / group / 1e12, 2),
                "episode_mfu_pct_v5e_bf16": round(100 * mfu, 1),
                "baseline_note": "baseline 7.45 img/s is a DERIVED optimistic A100 bound "
                "(tools/baseline_roofline.py: 15.3 TF/img at generous eager-fp16 phase "
                "efficiencies + host syncs) — vs_baseline is a lower bound on the speedup",
            }
        )
    )


if __name__ == "__main__":
    main()
