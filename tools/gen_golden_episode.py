"""Dev-only: golden END-TO-END prompt-TTA episode from the reference code.

Runs the actual upstream inner loop (`TPT/tpt_cls_rl.py::test_time_tuning`)
on tiny full-vocab CLIP policy/reward models (randomized weights) in fp32 on
CPU (GradScaler/autocast disabled = passthrough), and records everything a
parity test needs: both state dicts, the initial CoOp context, the input
views, per-step losses, and the final adapted logits.

Usage: python tools/gen_golden_episode.py
"""

import argparse
import os
import sys
import types

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden_episode.npz")
REF = "/root/reference/TPT"


def tiny_clip_torch(ref_model, seed):
    model = ref_model.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, t in sd.items():
        if t.dtype.is_floating_point:
            t.normal_(0.0, 0.02, generator=gen)
    model.load_state_dict(sd)
    return model.eval().float()


def main():
    if not os.path.isdir(REF):
        raise SystemExit("reference checkout not found")
    sys.modules.setdefault("ftfy", types.SimpleNamespace(fix_text=lambda s: s))
    if "pkg_resources" not in sys.modules:
        import packaging.version as _pv

        stub = types.ModuleType("pkg_resources")
        stub.packaging = types.SimpleNamespace(version=_pv)
        sys.modules["pkg_resources"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for name in (
            "Compose", "Resize", "CenterCrop", "ToTensor", "Normalize", "RandomResizedCrop",
            "RandomHorizontalFlip", "RandomApply", "ColorJitter", "RandomGrayscale", "GaussianBlur",
        ):
            setattr(tvt, name, type(name, (), {"__init__": lambda self, *a, **k: None, "__call__": lambda self, x: x}))
        tvt.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
        tvd = types.ModuleType("torchvision.datasets")
        tvd.ImageFolder = type("ImageFolder", (), {})
        tv.transforms = tvt
        tv.datasets = tvd
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.datasets"] = tvd
    sys.path.insert(0, REF)
    # The clip package import chain hard-fails unless a checkpoint dir
    # exists; pretend it does for the imports (nothing is ever loaded).
    import os.path as _osp

    orig_exists = _osp.exists
    _osp.exists = lambda p: True if "pretrained/clip" in str(p) else orig_exists(p)
    try:
        import clip.model as ref_model  # noqa: E402
        import clip as ref_clip  # noqa: E402
    finally:
        pass  # keep patched until clip_reward is imported below

    policy = tiny_clip_torch(ref_model, seed=10)
    reward_clip = tiny_clip_torch(ref_model, seed=20)

    # Monkeypatch the checkpoint loader everywhere the reference calls it.
    def fake_load(arch, device=None, download_root=None, **kw):
        return (policy if "policy" in str(arch) else reward_clip), 32, None

    ref_clip.load = fake_load
    try:
        import clip.custom_clip as cc  # noqa: E402
        import clip_reward as cr  # noqa: E402
    finally:
        _osp.exists = orig_exists

    cc.load = fake_load
    cr.clip.load = fake_load

    classnames = ["dog", "cat", "bird"]
    model = cc.ClipTestTimeTuning("cpu", classnames, None, arch="policy", n_ctx=4, ctx_init="a_photo_of_a")
    for name, param in model.named_parameters():
        if "prompt_learner" not in name:
            param.requires_grad_(False)

    reward_model = cr.CLIPRewards(
        "cpu", arch="reward", classification=True, amplify_rewards=False, sample_k=2,
        reward_process=True, process_batch=False, default_resolutions=32,
    )
    reward_model.resolutions = 32  # tiny tower, no resize branch
    reward_model.set_class_features(tokenized_classes=model.prompt_learner.tokenized_prompts)

    optimizer = torch.optim.AdamW(model.prompt_learner.parameters(), lr=5e-3, weight_decay=5e-4)

    class PassthroughScaler:
        def scale(self, loss):
            return loss

        def step(self, opt):
            opt.step()

        def update(self):
            pass

    rng = np.random.default_rng(0)
    views = rng.normal(size=(8, 3, 32, 32)).astype(np.float32)

    args = argparse.Namespace(tta_steps=3, selection_p=0.25, min_entropy_reg=False, min_entropy_w=0.0)

    from tpt_cls_rl import test_time_tuning  # noqa: E402

    ctx0 = model.prompt_learner.ctx.detach().clone().numpy()
    test_time_tuning(model, torch.from_numpy(views), optimizer, PassthroughScaler(), args, reward_model=reward_model)
    with torch.no_grad():
        final_logits = model(torch.from_numpy(views[:1])).numpy()
    ctx_adapted = model.prompt_learner.ctx.detach().numpy()

    payload = {
        "views": views,
        "ctx0": ctx0,
        "ctx_adapted": ctx_adapted,
        "final_logits": final_logits,
        "classnames": np.array(classnames),
    }
    payload.update({f"policy::{k}": v.numpy() for k, v in policy.state_dict().items()})
    payload.update({f"reward::{k}": v.numpy() for k, v in reward_clip.state_dict().items()})
    np.savez(OUT, **payload)
    print(f"wrote {OUT}; final logits {final_logits}")

    # ----- encoder-TTA golden (CLIPCLS_TTA path, same inner loop) -----
    policy2 = tiny_clip_torch(ref_model, seed=10)  # fresh copy (prev was adapted? visual frozen, but be safe)
    cc.load = lambda *a, **k: (policy2, 32, None)
    enc = cc.CLIPCLS_TTA("cpu", classnames, arch="policy", prompt_prefix="a photo of a", only_visual=True)
    reward_model2 = cr.CLIPRewards(
        "cpu", arch="reward", classification=True, amplify_rewards=False, sample_k=2,
        reward_process=True, process_batch=False, default_resolutions=32,
    )
    reward_model2.resolutions = 32
    reward_model2.set_class_features(tokenized_classes=enc.tokenized_prompts)
    optimizer2 = torch.optim.AdamW(enc.parameters(), lr=1e-4, weight_decay=5e-4)
    args2 = argparse.Namespace(tta_steps=2, selection_p=0.25, min_entropy_reg=False, min_entropy_w=0.0)
    test_time_tuning(enc, torch.from_numpy(views), optimizer2, PassthroughScaler(), args2, reward_model=reward_model2)
    with torch.no_grad():
        enc_final = enc(torch.from_numpy(views[:1])).numpy()
    payload2 = {
        "views": views,
        "final_logits": enc_final,
        "classnames": np.array(classnames),
        "class_features": enc.class_features.detach().numpy(),
    }
    # save the PRISTINE policy weights (episode starts from them) — reload
    policy3 = tiny_clip_torch(ref_model, seed=10)
    payload2.update({f"policy::{k}": v.numpy() for k, v in policy3.state_dict().items()})
    payload2.update({f"reward::{k}": v.numpy() for k, v in reward_clip.state_dict().items()})
    out2 = OUT.replace("golden_episode", "golden_episode_encoder")
    np.savez(out2, **payload2)
    print(f"wrote {out2}; final logits {enc_final}")

    # ----- encoder-TTA with momentum-EMA re-anchoring over a sample stream -----
    # Reference flow (`tune_cls_rl.py:219-240` + `custom_clip.py:458-475`):
    # per sample: reset() to the anchor, restore optimizer, test_time_tuning,
    # predict, momentum_update_model() folds the adapted visual tower into the
    # EMA and re-anchors every update_freq samples with weight update_w.
    import copy

    policy4 = tiny_clip_torch(ref_model, seed=10)
    cc.load = lambda *a, **k: (policy4, 32, None)
    enc_m = cc.CLIPCLS_TTA(
        "cpu", classnames, arch="policy", prompt_prefix="a photo of a", only_visual=True,
        momentum_update=True, update_freq=2, update_w=0.5, momentum=0.9,
    )
    reward_model4 = cr.CLIPRewards(
        "cpu", arch="reward", classification=True, amplify_rewards=False, sample_k=2,
        reward_process=True, process_batch=False, default_resolutions=32,
    )
    reward_model4.resolutions = 32
    reward_model4.set_class_features(tokenized_classes=enc_m.tokenized_prompts)
    optimizer4 = torch.optim.AdamW(enc_m.parameters(), lr=1e-3, weight_decay=5e-4)
    optim_state4 = copy.deepcopy(optimizer4.state_dict())
    args4 = argparse.Namespace(tta_steps=2, selection_p=0.25, min_entropy_reg=False, min_entropy_w=0.0)

    n_samples = 3
    sample_views = rng.normal(size=(n_samples, 8, 3, 32, 32)).astype(np.float32)
    finals = []
    for i in range(n_samples):
        with torch.no_grad():
            enc_m.reset()
        optimizer4.load_state_dict(copy.deepcopy(optim_state4))
        test_time_tuning(enc_m, torch.from_numpy(sample_views[i]), optimizer4, PassthroughScaler(),
                         args4, reward_model=reward_model4)
        with torch.no_grad():
            finals.append(enc_m(torch.from_numpy(sample_views[i][:1])).numpy())
        enc_m.momentum_update_model()

    payload3 = {
        "sample_views": sample_views,
        "final_logits": np.concatenate(finals, axis=0),
        "classnames": np.array(classnames),
        "momentum": np.array(0.9),
        "update_freq": np.array(2),
        "update_w": np.array(0.5),
        "lr": np.array(1e-3),
        "tta_steps": np.array(2),
    }
    policy5 = tiny_clip_torch(ref_model, seed=10)  # pristine weights
    payload3.update({f"policy::{k}": v.numpy() for k, v in policy5.state_dict().items()})
    payload3.update({f"reward::{k}": v.numpy() for k, v in reward_clip.state_dict().items()})
    out3 = OUT.replace("golden_episode", "golden_episode_encoder_momentum")
    np.savez(out3, **payload3)
    print(f"wrote {out3}; per-sample final logits {np.concatenate(finals, axis=0)}")


if __name__ == "__main__":
    main()
