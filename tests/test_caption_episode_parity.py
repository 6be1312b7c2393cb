"""END-TO-END caption-TTA parity vs the reference loop (golden fixture).

`tools/gen_golden_caption_episode.py` replays `caption/capdec_tta.py:92-143`
in torch (reference TransformerMapper + HF OPT + reference torch CLIP reward
+ AdamW eps=1e-6) and records the full trajectory. This test runs the same
episode through `CaptionTTA.adapt_image` from the converted weights and
asserts the per-step sampled captions, rewards, and final beam-5 caption
match — closing the loop-composition gap the per-component oracles
(mapper/OPT/tokenizer/loss-slice) don't cover: selection of beams feeding the
reward, reward baselining feeding the weighted CE, and the AdamW trajectory
feeding the next step's generation.
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_caption_episode.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="golden fixture not generated")
@pytest.mark.slow
def test_caption_tta_full_loop_matches_reference(tmp_path):
    from rlcf_tpu.core.reward import ClipReward, RewardConfig
    from rlcf_tpu.models import mappers as M
    from rlcf_tpu.models import opt as O
    from rlcf_tpu.models.convert import convert_clip_state_dict
    from rlcf_tpu.tasks import caption as Cap
    from rlcf_tpu.tokenizer_gpt2 import Gpt2Tokenizer

    data = np.load(FIXTURE, allow_pickle=True)
    hp = json.loads(str(data["hparams"]))

    vp, mp = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vp.write_text(str(data["vocab_json"]))
    mp.write_text(str(data["merges_txt"]))
    tok = Gpt2Tokenizer(str(vp), str(mp))

    sd_map = {k[len("sdmap::"):]: data[k] for k in data.files if k.startswith("sdmap::")}
    mcfg = M.MapperConfig(
        "transformer", clip_dim=hp["clip_dim"], llm_dim=hp["opt_hid"],
        prefix_length=hp["prefix_len"], clip_length=hp["clip_len"], num_layers=1,
    )
    mapper_params = M.convert_mapper_state_dict(sd_map, mcfg)

    sd_opt = {k[len("sdopt::"):]: data[k] for k in data.files if k.startswith("sdopt::")}
    opt_params, ocfg = O.convert_opt_state_dict(sd_opt, n_heads=2)
    ocfg = O.OPTConfig(**{**ocfg.__dict__, "eos_newline_id": int(data["newline_id"])})

    sd_rclip = {k[len("sdrclip::"):]: data[k] for k in data.files if k.startswith("sdrclip::")}
    rparams, rcfg_arch = convert_clip_state_dict(sd_rclip)
    reward = ClipReward(
        rparams, rcfg_arch,
        RewardConfig(sample_k=hp["sample_k"], reward_process=True, process_batch=False, amplify=False),
    )

    ccfg = Cap.CaptionModelConfig(mapper=mcfg, opt=ocfg)
    params = {"mapper": mapper_params, "opt": opt_params}
    tta = Cap.CaptionTTA(
        params, ccfg, reward, tok,
        tta_steps=hp["tta_steps"], lr=hp["lr"], weight_decay=hp["wd"],
        sample_k=hp["sample_k"], max_new_tokens=hp["max_new"],
    )

    trace: list = []
    caption = tta.adapt_image(np.asarray(data["image"]), np.asarray(data["clip_emb"]), trace=trace)

    assert len(trace) == hp["tta_steps"]
    for s in range(hp["tta_steps"]):
        got_texts = [t for t, _ in trace[s]]
        got_rewards = np.array([r for _, r in trace[s]], np.float32)
        want_texts = [str(t) for t in data[f"step{s}_texts"]]
        assert got_texts == want_texts, f"step {s} sampled captions diverge"
        np.testing.assert_allclose(got_rewards, data[f"step{s}_rewards"], rtol=2e-3, atol=2e-4)

    assert caption == str(data["final_text"])
