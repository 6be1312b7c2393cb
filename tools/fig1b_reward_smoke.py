"""Reproduce the paper's Figure 1(b) CLIPScore matrix (reference golden).

The reference's only in-repo golden values are the Fig. 1(b) similarity
tensors hard-coded in `TPT/clip_reward.py:360-371`: CLIPScore (w=2.5) of
three COCO val2014 images against three captions, for ViT-B/16 and ViT-L/14,
plus the mean-baseline-subtracted rewards. This tool recomputes them with
this framework's CLIP towers and compares — the one end-to-end REAL-WEIGHTS
parity check the reference itself ships.

Needs the three images and real checkpoints (none exist in the zero-egress
build environment — run where you have them):

  python tools/fig1b_reward_smoke.py --images_dir test_images \
      --arch ViT-L/14 --clip_checkpoint ViT-L-14.pt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

CAPTIONS = [
    "There are three sheeps standing together on the grass.",
    "A group of baseball players is crowded at the mound.",
    "Two girls bathe an elephant lying on its side",
]

IMAGE_ORDER = [
    "COCO_val2014_000000001164.jpg",
    "COCO_val2014_000000000772.jpg",
    "COCO_val2014_000000000192.jpg",
]

# hard-coded expected tensors from `TPT/clip_reward.py:360-371`
EXPECTED = {
    "ViT-B/16": np.array(
        [[0.4146, 0.7624, 0.4753],
         [0.3114, 0.4829, 0.6724],
         [0.8394, 0.3277, 0.2738]], np.float32
    ),
    "ViT-L/14": np.array(
        [[0.0721, 0.6127, 0.2376],
         [0.0638, 0.2741, 0.3465],
         [0.7014, 0.2067, 0.0213]], np.float32
    ),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images_dir", required=True, help="dir with the three COCO val2014 images")
    p.add_argument("--arch", default="ViT-L/14", choices=list(EXPECTED))
    p.add_argument("--clip_checkpoint", required=True)
    p.add_argument("--atol", type=float, default=5e-3)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import jax.numpy as jnp

    from rlcf_tpu.models import clip as C
    from rlcf_tpu.models.convert import load_clip_checkpoint
    from rlcf_tpu.data.transforms import preprocess_pil
    from rlcf_tpu.tokenizer import tokenize

    params, cfg = load_clip_checkpoint(args.clip_checkpoint)
    imgs = np.stack([
        preprocess_pil(os.path.join(args.images_dir, f), cfg.image_resolution) for f in IMAGE_ORDER
    ])

    img_feats = C.normalize(C.encode_image(params, cfg, jnp.asarray(imgs)).astype(jnp.float32))
    txt = C.normalize(C.encode_text(params, cfg, jnp.asarray(tokenize(CAPTIONS, truncate=True))).astype(jnp.float32))
    sim = np.asarray(2.5 * txt @ img_feats.T)

    print("similarity:\n", np.round(sim, 4))
    print("rewards (mean-baseline):\n", np.round(sim - sim.mean(axis=0, keepdims=True), 4))
    want = EXPECTED[args.arch]
    err = np.abs(sim - want).max()
    print(f"max |diff| vs reference golden ({args.arch}): {err:.4f}")
    if err > args.atol:
        raise SystemExit(f"FIG 1(b) MISMATCH: {err:.4f} > atol {args.atol}")
    print("FIG 1(b) PARITY OK")


if __name__ == "__main__":
    main()
