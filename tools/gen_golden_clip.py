"""Dev-only: generate golden CLIP activations from the reference implementation.

Instantiates tiny CLIP models through the upstream torch implementation (if the
read-only reference checkout is present), randomizes their weights, and records
state dict + fixed inputs + forward activations as npz fixtures. Tests then
convert the same state dict with rlcf_tpu.models.convert and assert numerical
parity of encode_image / encode_text / forward.

Usage: python tools/gen_golden_clip.py
"""

import os
import sys

import numpy as np
import torch

REFERENCE = "/root/reference/TPT/clip"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def randomize_(model: torch.nn.Module, seed: int):
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for key, tensor in sd.items():
        if tensor.dtype.is_floating_point:
            if "running_var" in key:
                tensor.uniform_(0.5, 1.5, generator=gen)
            elif "running_mean" in key:
                tensor.normal_(0.0, 0.1, generator=gen)
            else:
                tensor.normal_(0.0, 0.05, generator=gen)
    model.load_state_dict(sd)


def make_tokens(rng, batch, vocab, context=77):
    toks = np.zeros((batch, context), dtype=np.int64)
    for i in range(batch):
        n = rng.integers(3, 10)
        toks[i, 0] = vocab - 2  # pseudo-SOT below EOT id
        toks[i, 1 : n + 1] = rng.integers(1, vocab - 10, size=n)
        toks[i, n + 1] = vocab - 1  # EOT = max id, argmax pools here
    return toks


def dump(name: str, model, res: int, vocab: int, seed: int):
    rng = np.random.default_rng(seed)
    model = model.eval().float()
    images = rng.standard_normal((2, 3, res, res), dtype=np.float32)
    tokens = make_tokens(rng, 3, vocab)
    with torch.no_grad():
        img_feat = model.encode_image(torch.from_numpy(images)).numpy()
        txt_feat = model.encode_text(torch.from_numpy(tokens)).numpy()
        lpi, lpt = model(torch.from_numpy(images), torch.from_numpy(tokens))
    sd = {f"sd::{k}": v.numpy() for k, v in model.state_dict().items()}
    np.savez(
        os.path.join(OUT_DIR, f"golden_clip_{name}.npz"),
        images=images,
        tokens=tokens,
        image_features=img_feat,
        text_features=txt_feat,
        logits_per_image=lpi.numpy(),
        **sd,
    )
    print(f"wrote golden_clip_{name}.npz  img{img_feat.shape} txt{txt_feat.shape}")


def main():
    if not os.path.isdir(REFERENCE):
        raise SystemExit("reference checkout not found; fixture regeneration unavailable")
    sys.path.insert(0, REFERENCE)
    import model as ref_model  # noqa: E402  (reference module)

    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(0)

    vit = ref_model.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=512,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )
    randomize_(vit, seed=1)
    dump("vit", vit, res=32, vocab=512, seed=11)

    rn = ref_model.CLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1), vision_width=16,
        vision_patch_size=None, context_length=77, vocab_size=512,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
    )
    randomize_(rn, seed=2)
    dump("rn", rn, res=64, vocab=512, seed=22)

    rn2 = ref_model.CLIP(
        embed_dim=64, image_resolution=64, vision_layers=(2, 2, 2, 2), vision_width=32,
        vision_patch_size=None, context_length=77, vocab_size=512,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
    )
    randomize_(rn2, seed=3)
    dump("rn2", rn2, res=64, vocab=512, seed=33)


if __name__ == "__main__":
    main()
