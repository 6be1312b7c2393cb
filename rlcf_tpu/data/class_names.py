"""Class-name metadata and prompt assembly.

Loads the packaged JSON asset (ImageNet class names, the 80 CLIP prompt
templates, OOD-variant masks, fine-grained dataset class lists) and reproduces
the reference's dataset-id -> classnames resolution (`TPT/tpt_cls_rl.py:162-180`)
and prompt assembly ``prefix + " " + name + "."``
(`TPT/clip/custom_clip.py:128,380`).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Sequence

_ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "class_metadata.json")

# Dataset ids follow the reference convention: single letters are ImageNet
# variants (`TPT/data/datautils.py:22-39`), long names are fine-grained sets.
IMAGENET_VARIANTS = ("I", "A", "R", "V", "K", "C")
FINE_GRAINED = ("flower102", "dtd", "pets", "cars", "ucf101", "caltech101", "food101", "sun397", "aircraft", "eurosat")


@functools.lru_cache()
def _meta() -> dict:
    with open(_ASSET) as fh:
        return json.load(fh)


def imagenet_classes() -> List[str]:
    return list(_meta()["imagenet_classes"])


def imagenet_templates() -> List[str]:
    return list(_meta()["imagenet_templates"])


def variant_class_indices(set_id: str) -> List[int]:
    """Indices into the 1000 ImageNet classes kept by an OOD variant."""
    meta = _meta()
    if set_id in ("I", "K", "C"):
        return list(range(1000))
    if set_id == "A":
        return list(meta["imagenet_a_mask"])
    if set_id == "R":
        return [i for i, keep in enumerate(meta["imagenet_r_mask"]) if keep]
    if set_id == "V":
        return list(meta["imagenet_v_mask"])
    raise KeyError(set_id)


def get_classnames(set_id: str) -> List[str]:
    """Class names for a dataset id (ImageNet variant letter or fine-grained name)."""
    meta = _meta()
    if set_id in IMAGENET_VARIANTS:
        names = meta["imagenet_classes"]
        return [names[i] for i in variant_class_indices(set_id)]
    if set_id in meta["fine_grained"]:
        return list(meta["fine_grained"][set_id])
    if set_id == "bongard":
        # binary HOI concept membership (`TPT/clip/custom_clip.py:350-354`;
        # learned_cls replaces these with learnable class tokens)
        return ["True", "False"]
    raise KeyError(f"unknown dataset id {set_id!r}")


def assemble_prompts(classnames: Sequence[str], prefix: str = "a photo of a") -> List[str]:
    """``"<prefix> <name>."`` with underscores in names replaced by spaces."""
    prefix = prefix.replace("_", " ")
    return [f"{prefix} {name.replace('_', ' ')}." for name in classnames]


def assemble_template_prompts(classnames: Sequence[str], templates: Sequence[str] | None = None) -> List[List[str]]:
    """Per-class prompt ensembles over the 80 CLIP templates."""
    templates = templates or imagenet_templates()
    return [[t.format(name.replace("_", " ")) for t in templates] for name in classnames]
