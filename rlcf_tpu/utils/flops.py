"""Analytic FLOP accounting for the bench matrix (2 FLOPs/MAC, bwd = 2x fwd).

XLA's ``cost_analysis()`` under-reports dot/conv FLOPs ~10x on this repo's
axon backend (PERF.md round 2), so MFU numbers are computed from standard
transformer accounting instead. Conventions:
- ViT block: 24·T·W² (qkv/proj/mlp) + 4·T²·W (attention matmuls)
- text block: 24·T·W² (T² term negligible at 77 tokens and dropped, matching
  the round-2 bench's accounting)
"""

from __future__ import annotations


def vit_flops(width: int, layers: int, tokens: int, patch_dim: int, embed: int) -> float:
    """One image forward through a ViT tower (patch embed + blocks + proj)."""
    per_layer = 24 * tokens * width * width + 4 * tokens * tokens * width
    return layers * per_layer + 2 * tokens * patch_dim * width + 2 * width * embed


def vit_tower_flops(cfg, n_images: int = 1, resolution: int | None = None) -> float:
    """Forward FLOPs for ``n_images`` through a ClipConfig's ViT tower."""
    res = resolution or cfg.image_resolution
    tokens = (res // cfg.vision_patch_size) ** 2 + 1
    return n_images * vit_flops(
        cfg.vision_width, cfg.vision_layers, tokens, cfg.vision_patch_size ** 2 * 3, cfg.embed_dim
    )


def text_tower_flops(cfg, n_tokens_total: int) -> float:
    """Forward FLOPs for ``n_tokens_total`` text tokens through the text tower."""
    return cfg.text_layers * 24 * n_tokens_total * cfg.text_width ** 2


def transformer_decode_flops(n_layers: int, width: int, n_tokens: int, context: int) -> float:
    """Autoregressive decode of ``n_tokens`` with KV cache at average
    ``context`` length: per token 24·W² per layer + 4·ctx·W attention."""
    per_token = n_layers * (24 * width * width + 4 * context * width)
    return n_tokens * per_token


V5E_BF16_PEAK = 197e12
