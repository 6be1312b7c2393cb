"""Analytic A100 roofline of the REFERENCE flagship step (BASELINE derivation).

Derives an OPTIMISTIC upper bound on the reference's per-sample TTA
throughput (`TPT/scripts/rlcf-prompt.sh` config) on one A100, from the
reference's own step structure — so `bench.py`'s `vs_baseline` is a LOWER
bound on the real speedup instead of an unsupported estimate.

Reference per-image work (fp16 autocast, `TPT/tpt_cls_rl.py:47-79` +
`custom_clip.py:315-335` + `clip_reward.py:130-165`):
  step 0:  ViT-B/16 fwd on 64 AugMix views (no-grad) -> select 6 confident
           views (selection_p=0.1); ViT-L/14 reward fwd on the 6 views
           (set_image_features, once per sample); text tower fwd+bwd on all
           200 ImageNet-A class prompts x 77 tokens (grads reach the CoOp
           ctx through the whole text tower); optimizer step.
  steps 1,2: ViT-B/16 fwd on the 6 selected views + text fwd+bwd + step.
  final:   ViT-B/16 fwd on the center view + text fwd (no grad).
  Reward CLIPScore per step only INDEXES precomputed class features
  (`clip_reward.py:117-128`) — negligible FLOPs.

Host structure serialized with the device per sample: 3x GradScaler.update()
syncs (reads _found_inf on host), optimizer.load_state_dict + model.reset
(`tpt_cls_rl.py:250-255`), H2D of the 64-view fp32 batch (38.5 MB pinned).
AugMix view generation runs in 8 dataloader workers (`params.py:25`) and
overlaps; it is NOT charged to the bound (another generosity: PIL AugMix at
~250 ms/img/core would bottleneck past ~8 img/s even with 8 workers).

Per-phase efficiency bounds (generous for eager-mode fp16 PyTorch on A100,
312 TFLOP/s dense fp16; kernel-launch-bound small batches get low MFU):
  64-view ViT-B fwd  50%   (large batch, cuDNN/cuBLAS steady state)
  6-view ViT-B fwd   15%   (latency/launch-bound: 6 imgs x ~150 kernels)
  text fwd+bwd       45%   (bs 200x77, d=512 — medium matmuls)
  6-view ViT-L fwd   25%   (small batch, bigger model)

Run: python tools/baseline_roofline.py
"""

import json

A100_FP16_PEAK = 312e12


def derive(verbose: bool = True) -> dict:
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.utils.flops import text_tower_flops, vit_tower_flops

    pcfg = C.get_config("ViT-B/16")
    rcfg = C.get_config("ViT-L/14")
    n_views, n_keep, n_cls, t_txt, steps = 64, 6, 200, 77, 3

    phases = {
        # (FLOPs, efficiency bound)
        "policy_fwd_64view_step0": (vit_tower_flops(pcfg, n_views, 224), 0.50),
        # steps 1,2 re-forward the 6 selected views; +1 final center view
        "policy_fwd_6view_steps12_final": (
            vit_tower_flops(pcfg, n_keep * (steps - 1) + 1, 224), 0.15),
        # text tower: fwd+bwd (3x fwd) each step + final no-grad fwd
        "text_fwd_bwd": (
            (3 * steps + 1) * text_tower_flops(pcfg, n_cls * t_txt), 0.45),
        "reward_fwd_6view": (vit_tower_flops(rcfg, n_keep, 224), 0.25),
    }
    device_ms = {k: f / (A100_FP16_PEAK * e) * 1e3 for k, (f, e) in phases.items()}
    total_flops = sum(f for f, _ in phases.values())

    # Host terms serialized with the device (generous: zero Python/dispatch
    # cost inside the eager per-layer loop, which alone is ~150 kernel
    # launches x ~5 us for the small-batch forwards).
    host_ms = {
        "h2d_64view_fp32": 64 * 224 * 224 * 3 * 4 / 10e9 * 1e3,  # 38.5 MB @ 10 GB/s pinned
        "scaler_syncs_3x": 3 * 2.0,  # GradScaler.update host sync + relaunch ramp
        "reset_and_optim_reload": 5.0,  # model.reset + optimizer.load_state_dict + zero_grad x3
    }

    dev_total = sum(device_ms.values())
    host_total = sum(host_ms.values())
    ms_per_img = dev_total + host_total
    out = {
        "config": "rlcf-prompt.sh: ViT-B/16 policy, ViT-L/14 reward, 64 views, "
                  "selection_p=0.1, tta_steps=3, 200 classes (ImageNet-A)",
        "total_tflops_per_image": round(total_flops / 1e12, 2),
        "device_ms": {k: round(v, 1) for k, v in device_ms.items()},
        "host_ms": {k: round(v, 1) for k, v in host_ms.items()},
        "ms_per_image_bound": round(ms_per_img, 1),
        "img_per_s_bound": round(1e3 / ms_per_img, 2),
        "abs_ceiling_img_per_s_100pct_mfu_no_host": round(
            A100_FP16_PEAK / total_flops, 2),
    }
    if verbose:
        print(json.dumps(out, indent=2))
    return out


def derive_matrix(verbose: bool = True) -> dict:
    """Optimistic A100 bounds for the OTHER three pipelines (their scripts'
    configs), same method as the flagship: the reference's own per-unit work
    at generous per-phase eager-fp16 efficiencies + its serialized host terms.

    Encoder (`rlcf-tune.sh`): text features are cached per dataset — per
    image it is the 64-view selection fwd, 3x(6-view fwd+bwd through the
    visual tower), the 6-view ViT-L reward fwd, a final 1-view fwd, and a
    FULL visual-tower state_dict reload per sample (`tune_cls_rl.py` reset).

    Retrieval (`tta_coco_ret.sh`): per query 8x(1-sample policy fwd+bwd) +
    final fwd against cached gallery features; i2t drives the image tower
    (single-image batches are launch-bound), t2i the text tower.

    Caption (`tta_capdec_c2n.sh`): 4x(beam-6, 50 new tokens) + final beam-5
    through OPT-125m via HF eager generate — bounded at 1.0 ms/token
    (weight stream 0.125 ms @ 2 TB/s + ~100 kernel launches + beam host
    logic; real HF eager measures several x higher) — plus the
    reward-weighted CE fwd+bwd and the retokenize round-trips.
    """
    from rlcf_tpu.models import clip as C
    from rlcf_tpu.utils.flops import text_tower_flops, vit_tower_flops

    pcfg = C.get_config("ViT-B/16")
    rcfg = C.get_config("ViT-L/14")
    P = A100_FP16_PEAK

    def ms(flops, eff):
        return flops / (P * eff) * 1e3

    out = {}
    # --- encoder TTA (rlcf-tune.sh) ---
    dev = (
        ms(vit_tower_flops(pcfg, 64, 224), 0.50)
        + ms(3 * 3 * vit_tower_flops(pcfg, 6, 224), 0.20)
        + ms(vit_tower_flops(rcfg, 6, 224), 0.25)
        + ms(vit_tower_flops(pcfg, 1, 224), 0.10)
    )
    host = 3.9 + 6.0 + 15.0  # H2D + 3x scaler syncs + 87M-param state_dict/opt reload
    out["encoder_tta"] = {"ms_per_image_bound": round(dev + host, 1),
                          "img_per_s_bound": round(1e3 / (dev + host), 2)}
    # --- retrieval (tta_coco_ret.sh): 8 steps, batch-1 queries ---
    i2t_dev = ms((8 * 3 + 1) * vit_tower_flops(pcfg, 1, 224), 0.10)  # launch-bound bs=1
    t2i_dev = ms((8 * 3 + 1) * text_tower_flops(pcfg, 77), 0.30)
    ret_host = 8 * 2.0 + 15.0  # per-step scaler syncs + per-query tower reset
    out["retrieval_i2t"] = {"ms_per_query_bound": round(i2t_dev + ret_host, 1),
                            "q_per_s_bound": round(1e3 / (i2t_dev + ret_host), 2)}
    out["retrieval_t2i"] = {"ms_per_query_bound": round(t2i_dev + ret_host, 1),
                            "q_per_s_bound": round(1e3 / (t2i_dev + ret_host), 2)}
    # --- caption TTA (tta_capdec_c2n.sh) ---
    gen_ms = 5 * 50 * 1.0          # 5 generations x 50 tokens x 1.0 ms/token bound
    ce = 4 * 3 * 6 * 72 * 2 * 125e6  # 4 steps x fwd+bwd x 6 caps x ~72 tok x 2 FLOP/param
    cap_dev = gen_ms + ms(ce, 0.30) + ms(vit_tower_flops(rcfg, 1, 224), 0.25) \
        + ms(4 * text_tower_flops(rcfg, 6 * 77), 0.30)
    cap_host = 4 * 5.0 + 5.0       # retokenize round-trips + mapper/opt reset
    out["caption_tta"] = {"ms_per_image_bound": round(cap_dev + cap_host, 1),
                          "img_per_s_bound": round(1e3 / (cap_dev + cap_host), 2)}
    if verbose:
        print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    import sys

    derive()
    if "--all" in sys.argv:
        derive_matrix()
