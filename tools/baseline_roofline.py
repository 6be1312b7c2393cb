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


if __name__ == "__main__":
    derive()
