"""Dev-only: golden activations for the ClipCap/CapDec prefix mappers.

Runs the reference mapper modules (torch) on fixed inputs with randomized
weights and dumps state dict + outputs for parity tests.

Usage: python tools/gen_golden_mapper.py
"""

import os
import sys
import types

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
REFERENCE = "/root/reference/caption"


def main():
    if not os.path.isdir(REFERENCE):
        raise SystemExit("reference checkout not found")
    sys.path.insert(0, REFERENCE)
    # modules.py imports the OPT fork; provide import path
    import image_llm.models.modules as ref  # noqa: E402

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # TransformerMapper: dim_clip=16, dim_embedding=24, prefix_length=5, clip_length=3, layers=2
    tm = ref.TransformerMapper(16, 24, 5, 3, num_layers=2).eval()
    x = rng.normal(size=(2, 16)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x)).numpy()
    sd = {f"sd::clip_project.{k}": v.numpy() for k, v in tm.state_dict().items()}
    np.savez(os.path.join(OUT, "golden_mapper_transformer.npz"), x=x, out=out, **sd)
    print("transformer mapper:", out.shape)

    # MLP mapper: sizes (16, (24*5)//2, 24*5)
    mlp = ref.MLP((16, (24 * 5) // 2, 24 * 5)).eval()
    with torch.no_grad():
        out2 = mlp(torch.from_numpy(x)).numpy().reshape(2, 5, 24)
    sd2 = {f"sd::clip_project.{k}": v.numpy() for k, v in mlp.state_dict().items()}
    np.savez(os.path.join(OUT, "golden_mapper_mlp.npz"), x=x, out=out2, **sd2)
    print("mlp mapper:", out2.shape)


if __name__ == "__main__":
    main()
