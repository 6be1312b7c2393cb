"""Dev-only: golden END-TO-END caption-TTA episode from the reference loop.

Replays the reference caption TTA inner loop (`caption/capdec_tta.py:92-143`)
in torch on tiny models and records everything a parity test needs:

- mapper: the reference's own ``TransformerMapper``
  (`caption/image_llm/models/modules.py:172-186`), trainable;
- LLM: a tiny stock HF ``OPTForCausalLM`` (fp32). Generation goes through HF
  ``generate(inputs_embeds=...)`` — the reference's forked
  ``generate(query_embeds=...)`` (`image_llm/models/generate_opt.py:64-79`)
  is behaviourally identical for an empty prompt (repo tests
  `test_opt.py::test_beam_matches_hf_beam_search` pin that equivalence), and
  the fork's ``generate`` cannot run under this transformers version;
- reward: the reference's torch CLIP class (`TPT/clip/model.py`) with tiny
  dims + the exact CLIPScore/post-process math of
  `caption/clip_reward.py:88-170` (max(2.5·cos, 0), mean-baseline);
- tokenizer: the repo's byte-level GPT-2 BPE over a synthetic full-byte
  vocab (id-exact to HF over these files, pinned by
  `test_caption.py::test_gpt2_matches_hf_gpt2_tokenizer`);
- optimizer: ``torch.optim.AdamW(lr, eps=1e-6)`` (`capdec_tta.py` setup).

Records per-step sampled texts, rewards, losses, and the final beam-5
caption. Usage: python tools/gen_golden_caption_episode.py
"""

import json
import os
import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden_caption_episode.npz")
REF_CAPTION = "/root/reference/caption"
REF_TPT = "/root/reference/TPT"

# episode hyperparameters (tiny but non-trivial)
TTA_STEPS = 3
SAMPLE_K = 3
LR = 0.05
WD = 0.0
MAX_NEW = 6
PREFIX_LEN = 4
CLIP_LEN = 2
CLIP_DIM = 16
OPT_HID = 32


def build_tokenizer(tmpdir):
    """Full-byte vocab + a few merges; returns (tok, vocab_text, merges_text)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rlcf_tpu.tokenizer_gpt2 import Gpt2Tokenizer, _byte_to_unicode

    b2u = _byte_to_unicode()
    vocab = {"<pad>": 1, "</s>": 2}
    next_id = 4
    for ch in b2u.values():
        if ch not in vocab:
            vocab[ch] = next_id
            next_id += 1
    merges = ["t h", "th e", "Ġ t", "Ġt he"]
    for m in merges:
        vocab["".join(m.split())] = next_id
        next_id += 1
    vp, mp = os.path.join(tmpdir, "vocab.json"), os.path.join(tmpdir, "merges.txt")
    with open(vp, "w") as fh:
        json.dump(vocab, fh)
    merges_text = "#version\n" + "\n".join(merges) + "\n"
    with open(mp, "w") as fh:
        fh.write(merges_text)
    return Gpt2Tokenizer(vp, mp), json.dumps(vocab), merges_text


def tiny_reward_clip():
    """Tiny torch CLIP (reference class) for the reward tower."""
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
    sys.path.insert(0, REF_TPT)
    import os.path as _osp

    orig_exists = _osp.exists
    _osp.exists = lambda p: True if "pretrained/clip" in str(p) else orig_exists(p)
    try:
        import clip.model as ref_model  # noqa: E402
    finally:
        _osp.exists = orig_exists

    model = ref_model.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )
    gen = torch.Generator().manual_seed(7)
    sd = model.state_dict()
    for k, t in sd.items():
        if t.dtype.is_floating_point:
            t.normal_(0.0, 0.02, generator=gen)
    model.load_state_dict(sd)
    return model.eval().float()


def main():
    if not (os.path.isdir(REF_CAPTION) and os.path.isdir(REF_TPT)):
        raise SystemExit("reference checkout not found")
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    import tempfile

    tmpdir = tempfile.mkdtemp()
    tok, vocab_text, merges_text = build_tokenizer(tmpdir)
    newline_id = tok.encode("\n", add_bos=False)[0]

    # --- models -------------------------------------------------------------
    sys.path.insert(0, REF_CAPTION)
    import image_llm.models.modules as ref_mod  # noqa: E402

    mapper = ref_mod.TransformerMapper(CLIP_DIM, OPT_HID, PREFIX_LEN, CLIP_LEN, num_layers=1).float()
    for p in mapper.parameters():
        if p.dtype.is_floating_point:
            with torch.no_grad():
                p.normal_(0.0, 0.05, generator=torch.Generator().manual_seed(hash(p.shape) % 2**31))

    from transformers import OPTConfig as HFOptConfig, OPTForCausalLM

    hf_cfg = HFOptConfig(
        vocab_size=300, hidden_size=OPT_HID, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=64, max_position_embeddings=128, do_layer_norm_before=True,
        word_embed_proj_dim=OPT_HID, pad_token_id=1, bos_token_id=2, eos_token_id=2,
        activation_function="relu", dropout=0.0,
    )
    opt_model = OPTForCausalLM(hf_cfg).eval().float()

    rclip = tiny_reward_clip()
    from rlcf_tpu.tokenizer import tokenize as clip_tokenize  # id-exact CLIP BPE

    # --- inputs --------------------------------------------------------------
    clip_emb = rng.normal(size=(CLIP_DIM,)).astype(np.float32)
    image_nhwc = rng.normal(size=(224, 224, 3)).astype(np.float32) * 0.5

    # reward image features (`clip_reward.py:169-177`): bicubic align_corners
    # resize to the tower resolution, encode, normalize
    img_t = torch.from_numpy(image_nhwc).permute(2, 0, 1)[None]
    img_t = F.interpolate(img_t, size=32, mode="bicubic", align_corners=True)
    with torch.no_grad():
        img_feat = rclip.encode_image(img_t).float()
        img_feat = img_feat / img_feat.norm(dim=1, keepdim=True)

    def reward_of(texts):
        with torch.no_grad():
            ct = torch.from_numpy(np.asarray(clip_tokenize([t if t else " " for t in texts], truncate=True)))
            tf = rclip.encode_text(ct).float()
            tf = tf / tf.norm(dim=1, keepdim=True)
            sim = 2.5 * torch.sum(tf * img_feat, dim=-1)
            scores = torch.maximum(sim, torch.zeros_like(sim))
            # rewards_post_process (`clip_reward.py:88-105`): mean baseline
            scores = scores.reshape(1, -1)
            return (scores - scores.mean(dim=-1, keepdim=True)).flatten()

    def generate_texts(num_beams, num_return):
        with torch.no_grad():
            prefix_embed = mapper(torch.from_numpy(clip_emb)[None]).reshape(1, PREFIX_LEN, -1)
            out = opt_model.generate(
                inputs_embeds=prefix_embed, do_sample=False, num_beams=num_beams,
                max_new_tokens=MAX_NEW, min_length=1, eos_token_id=newline_id,
                num_return_sequences=num_return, early_stopping=False, length_penalty=1.0,
            ).numpy()
        return tok.batch_decode(out, stop_id=newline_id)

    # --- the reference loop (`capdec_tta.py:92-143`) --------------------------
    # snapshot the INITIAL mapper weights (the loop mutates them in place)
    import copy

    mapper_sd0 = copy.deepcopy({k: v.clone() for k, v in mapper.state_dict().items()})
    optimizer = torch.optim.AdamW(mapper.parameters(), lr=LR, eps=1e-6, weight_decay=WD)
    step_texts, step_rewards, step_losses = [], [], []
    for _step in range(TTA_STEPS):
        mapper.eval()
        sampled_text = generate_texts(SAMPLE_K, SAMPLE_K)
        rewards = reward_of(sampled_text)
        step_texts.append(sampled_text)
        step_rewards.append(rewards.numpy().copy())

        mapper.train()
        optimizer.zero_grad()
        tokens_np, tmask_np = tok.batch_encode(sampled_text)  # pad-to-longest like HF padding=True
        tokens = torch.from_numpy(tokens_np.astype(np.int64))
        attn = torch.cat(
            [torch.ones((SAMPLE_K, PREFIX_LEN), dtype=torch.long), torch.from_numpy(tmask_np.astype(np.int64))],
            dim=1,
        )
        repeat_prefix = torch.from_numpy(clip_emb)[None].repeat(SAMPLE_K, 1)
        prefix_proj = mapper(repeat_prefix).view(-1, PREFIX_LEN, OPT_HID)
        emb_text = opt_model.get_input_embeddings()(tokens)
        outputs = opt_model(inputs_embeds=torch.cat([prefix_proj, emb_text], dim=1), attention_mask=attn)
        logits = outputs.logits[:, PREFIX_LEN - 1 : -1]
        all_loss = F.cross_entropy(
            logits.reshape(-1, logits.shape[-1]), tokens.flatten(), ignore_index=0, reduction="none"
        ).reshape(logits.shape[0], -1)
        loss = torch.mean(rewards * all_loss.mean(dim=-1))
        loss.backward()
        optimizer.step()
        step_losses.append(float(loss.detach()))

    mapper.eval()
    final_text = generate_texts(5, 1)[0]
    print("steps:", step_texts, step_rewards, step_losses)
    print("final:", repr(final_text))

    # --- dump ------------------------------------------------------------------
    payload = {
        "clip_emb": clip_emb,
        "image": image_nhwc,
        "final_text": np.array(final_text),
        "step_losses": np.array(step_losses, np.float32),
        "newline_id": np.array(newline_id),
        "vocab_json": np.array(vocab_text),
        "merges_txt": np.array(merges_text),
        "hparams": np.array(json.dumps(dict(
            tta_steps=TTA_STEPS, sample_k=SAMPLE_K, lr=LR, wd=WD, max_new=MAX_NEW,
            prefix_len=PREFIX_LEN, clip_len=CLIP_LEN, clip_dim=CLIP_DIM, opt_hid=OPT_HID,
        ))),
    }
    for s, (texts, rw) in enumerate(zip(step_texts, step_rewards)):
        payload[f"step{s}_texts"] = np.array(texts, dtype=object)
        payload[f"step{s}_rewards"] = rw
    # state dicts (fp32), prefixed: mapper gets clip_project. to match the converter
    for k, v in mapper_sd0.items():
        payload[f"sdmap::clip_project.{k}"] = v.numpy()
    for k, v in opt_model.state_dict().items():
        payload[f"sdopt::{k}"] = v.numpy()
    for k, v in rclip.state_dict().items():
        payload[f"sdrclip::{k}"] = v.numpy()
    np.savez(OUT, **payload)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
