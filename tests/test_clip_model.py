"""Numerical parity of the JAX CLIP vs reference-torch golden activations."""

import os

import numpy as np
import pytest

from rlcf_tpu.models import clip as C
from rlcf_tpu.models.convert import convert_clip_state_dict

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def load_golden(name):
    path = os.path.join(FIXTURES, f"golden_clip_{name}.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixture missing (regenerate: see tests/conftest.py)")
    data = np.load(path)
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    return data, sd


@pytest.fixture(scope="module", params=["vit", "rn", "rn2"])
def golden(request):
    data, sd = load_golden(request.param)
    params, cfg = convert_clip_state_dict(sd)
    return data, params, cfg


def test_arch_inference(golden):
    data, params, cfg = golden
    res = data["images"].shape[-1]
    assert cfg.image_resolution == res
    assert cfg.vocab_size == 512
    assert cfg.context_length == 77


def test_encode_image_parity(golden):
    data, params, cfg = golden
    images = np.transpose(data["images"], (0, 2, 3, 1))  # NCHW -> NHWC
    mine = np.asarray(C.encode_image(params, cfg, images))
    np.testing.assert_allclose(mine, data["image_features"], rtol=2e-4, atol=2e-5)


def test_encode_text_parity(golden):
    data, params, cfg = golden
    mine = np.asarray(C.encode_text(params, cfg, data["tokens"].astype(np.int32)))
    np.testing.assert_allclose(mine, data["text_features"], rtol=2e-4, atol=2e-5)


def test_forward_logits_parity(golden):
    data, params, cfg = golden
    images = np.transpose(data["images"], (0, 2, 3, 1))
    lpi, lpt = C.forward(params, cfg, images, data["tokens"].astype(np.int32))
    np.testing.assert_allclose(np.asarray(lpi), data["logits_per_image"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lpt), data["logits_per_image"].T, rtol=2e-4, atol=2e-4)


def test_encode_text_embeds_matches_encode_text(golden):
    data, params, cfg = golden
    tokens = data["tokens"].astype(np.int32)
    embeds = C.embed_tokens(params, tokens)
    eot = tokens.argmax(axis=-1)
    via_embeds = np.asarray(C.encode_text_embeds(params, cfg, embeds, eot))
    direct = np.asarray(C.encode_text(params, cfg, tokens))
    np.testing.assert_allclose(via_embeds, direct, rtol=1e-6, atol=1e-6)


def test_patch_tokens_shape():
    """pool=False returns all projected tokens (caption fork's cls=False)."""
    import jax

    cfg = C.get_config("test-tiny-vit")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    images = np.zeros((2, cfg.image_resolution, cfg.image_resolution, 3), np.float32)
    out = C.encode_image(params, cfg, images, pool=False)
    assert out.shape == (2, cfg.grid_size**2 + 1, cfg.embed_dim)


def test_short_sequence_text():
    import jax

    cfg = C.get_config("test-tiny-vit")
    params = C.init_clip_params(jax.random.PRNGKey(0), cfg)
    tokens = np.zeros((2, 16), np.int32)
    tokens[:, 0] = 510
    tokens[:, 5] = 511
    out = C.encode_text(params, cfg, tokens)
    assert out.shape == (2, cfg.embed_dim)
