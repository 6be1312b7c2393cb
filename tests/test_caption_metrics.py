"""Caption metrics: sanity + cross-checks against available oracles."""

import numpy as np
import pytest

from rlcf_tpu.metrics.caption_metrics import bleu, cider_d, get_all_metrics, meteor, ptb_tokenize, rouge_l
from rlcf_tpu.metrics.clipscore import clip_score

REFS = [
    ["a man is riding a wave on a surfboard", "a surfer rides a large wave"],
    ["two dogs play in the snow", "dogs playing in snowy weather"],
    ["a red car parked on the street", "a red automobile on the road"],
]
PERFECT = [r[0] for r in REFS]
CANDS = [
    "a man rides a wave on his surfboard",
    "two dogs are playing in the snow",
    "a blue bike leaning on a wall",
]


def test_perfect_candidates_score_one():
    b = bleu(REFS, PERFECT)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    assert abs(rouge_l(REFS, PERFECT) - 1.0) < 1e-9
    assert cider_d(REFS, PERFECT) > cider_d(REFS, CANDS)


def test_bleu_monotone_and_ordered():
    b = bleu(REFS, CANDS)
    assert len(b) == 4
    # higher-order BLEU never exceeds lower-order
    assert b[0] >= b[1] >= b[2] >= b[3] >= 0
    assert 0 < b[0] <= 1


def test_bleu_matches_nltk_corpus_bleu():
    """Cross-check BLEU-1..4 against nltk's corpus_bleu (closest ref length).

    Candidates share 4-grams with refs so no zero-count smoothing divergence.
    """
    from nltk.translate.bleu_score import corpus_bleu

    cands = ["a man is riding a big wave on a surfboard", "two dogs play in the deep snow", CANDS[2]]
    refs_tok = [[ptb_tokenize(r) for r in refs] for refs in REFS]
    cands_tok = [ptb_tokenize(c) for c in cands]
    mine = bleu(REFS, cands)
    for n in range(1, 5):
        ref_n = corpus_bleu(refs_tok, cands_tok, weights=tuple([1.0 / n] * n))
        assert abs(mine[n - 1] - ref_n) < 1e-9, n


def test_rouge_between_zero_and_one():
    r = rouge_l(REFS, CANDS)
    assert 0 <= r <= 1
    # the unrelated third candidate drags the average below perfect
    assert r < rouge_l(REFS[:2], CANDS[:2])


def test_meteor_runs():
    m = meteor(REFS, CANDS)
    assert 0 <= m <= 1
    assert meteor(REFS, PERFECT) > m


def test_meteor_mode_explicit_and_warns():
    """Degraded METEOR must be loud: mode reported, RuntimeWarning once."""
    import warnings

    from rlcf_tpu.metrics import caption_metrics as cm

    mode = cm.meteor_mode()
    assert mode in ("nltk_wordnet", "exact+stem", "exact_approx")
    if mode == "nltk_wordnet":
        pytest.skip("wordnet installed: no degradation to test")
    cm._METEOR_WARNED = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cm.meteor(REFS, CANDS)
        assert any(issubclass(x.category, RuntimeWarning) and "METEOR degraded" in str(x.message) for x in w)


def test_meteor_stem_stage_matches_inflections():
    """exact+stem matches inflected forms that exact-only scores at zero."""
    from rlcf_tpu.metrics import caption_metrics as cm

    if cm.meteor_mode() == "exact_approx":
        pytest.skip("nltk unavailable")
    refs = [["the dog runs quickly"]]
    cands = ["dogs running quick"]  # stems: dog/run/quick match, exact: none
    assert cm.meteor(refs, cands) > 0.2
    assert cm._meteor_exact(refs, cands) == 0.0


def test_get_all_metrics_keys():
    out = get_all_metrics(REFS, CANDS)
    assert set(out) == {"bleu", "meteor", "meteor_mode", "rouge", "cider", "caption_metrics_backend"}
    assert len(out["bleu"]) == 4


def test_clip_score_math():
    img = np.array([[1.0, 0.0], [0.0, 1.0]])
    cap = np.array([[1.0, 0.0], [-1.0, 0.0]])
    mean, per = clip_score(img, cap, w=2.5)
    np.testing.assert_allclose(per, [2.5, 0.0])
    assert mean == 1.25


def test_pycocoevalcap_golden_deviation():
    """When real pycocoevalcap is installed, quantify the pure scorers'
    deviation (VERDICT r2 item 9). Skips in this zero-egress environment."""
    import pytest

    from rlcf_tpu.metrics import caption_metrics as cm_mod
    if not cm_mod.pycocoevalcap_available():
        pytest.skip("pycocoevalcap not installed (zero-egress environment)")
    refs = [["a dog runs in the park", "the dog is running outside"],
            ["a red car on the street", "a red vehicle parked on a road"]]
    cands = ["a dog running in a park", "a red car parked on the road"]
    real = cm_mod.get_all_metrics_pycoco(refs, cands)
    pure = {
        "bleu": cm_mod.bleu(refs, cands),
        "rouge": cm_mod.rouge_l(refs, cands),
        "cider": cm_mod.cider_d(refs, cands),
    }
    for i in range(4):
        assert abs(real["bleu"][i] - pure["bleu"][i]) < 0.05, ("bleu", i)
    assert abs(real["rouge"] - pure["rouge"]) < 0.05
    assert abs(real["cider"] - pure["cider"]) < 0.5


def test_backend_field_records_what_ran():
    from rlcf_tpu.metrics import caption_metrics as cm_mod

    out = get_all_metrics(REFS, CANDS)
    expected = "pycocoevalcap" if cm_mod.pycocoevalcap_available() else "pure-python"
    # a present-but-broken pycocoevalcap install may legitimately fall back
    assert out["caption_metrics_backend"] in (expected, "pure-python")


def test_metric_backend_ab_fixture_pins_own_impl():
    """VERDICT r3 item 7: the committed A/B fixture (tools/metric_backend_ab.py)
    pins the own-impl scores on the golden caption set exactly; when
    pycocoevalcap is importable the recorded deltas must sit within bounds."""
    import json
    import os
    import sys

    from rlcf_tpu.metrics import caption_metrics as cm_mod

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "metric_backend_ab.json")
    with open(fixture) as fh:
        rec = json.load(fh)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from metric_backend_ab import BOUNDS, GOLDEN
    finally:
        sys.path.pop(0)

    refs = [r for _, r in GOLDEN]
    cands = [c for c, _ in GOLDEN]
    own = rec["own"]
    np.testing.assert_allclose(cm_mod.bleu(refs, cands), own["bleu"], atol=1e-12)
    np.testing.assert_allclose(cm_mod.rouge_l(refs, cands), own["rouge"], atol=1e-12)
    np.testing.assert_allclose(cm_mod.cider_d(refs, cands), own["cider"], atol=1e-12)
    if cm_mod.meteor_mode() == own["meteor_mode"]:
        np.testing.assert_allclose(cm_mod.meteor(refs, cands), own["meteor"], atol=1e-9)

    if rec.get("delta"):
        if rec.get("tokenization_identical"):
            # same tokens -> same n-gram math: EQUALITY up to float rounding
            # for the scorers that share the tokenization (METEOR still runs
            # a different matcher stack, bounds apply)
            for i, d in enumerate(rec["delta"]["bleu"]):
                assert d <= 1e-6, ("bleu", i, d)
            assert rec["delta"]["rouge"] <= 1e-6
            assert rec["delta"]["cider"] <= 1e-6
        else:
            for i, d in enumerate(rec["delta"]["bleu"]):
                assert d <= BOUNDS["bleu"], ("bleu", i, d)
            assert rec["delta"]["rouge"] <= BOUNDS["rouge"]
            assert rec["delta"]["cider"] <= BOUNDS["cider"]
        assert rec["delta"]["meteor"] <= BOUNDS["meteor"]
    elif cm_mod.pycocoevalcap_available():
        import pytest as _pytest

        _pytest.fail("pycocoevalcap importable but fixture has no deltas — "
                     "re-run tools/metric_backend_ab.py")


def test_ensure_wordnet_fetches_and_reprobes(monkeypatch):
    """ensure_wordnet downloads the wordnet corpora through nltk and re-probes
    the METEOR mode, so a connected default install is never degraded
    (VERDICT r4 item 6); zero-egress stays on the loud degraded path."""
    import nltk

    from rlcf_tpu.metrics import caption_metrics as cm

    calls = []
    monkeypatch.setattr(nltk, "download", lambda corpus, quiet=True: calls.append(corpus))
    probes = iter(["exact+stem", "nltk_wordnet"])
    monkeypatch.setattr(cm, "_probe_meteor_mode", lambda: next(probes))
    try:
        assert cm.ensure_wordnet() == "nltk_wordnet"
        assert calls == ["wordnet", "omw-1.4"]
    finally:
        cm._METEOR_MODE = None  # drop the faked probe result


def test_ensure_wordnet_respects_download_false(monkeypatch):
    import nltk

    from rlcf_tpu.metrics import caption_metrics as cm

    monkeypatch.setattr(nltk, "download",
                        lambda *a, **k: pytest.fail("download=False must not fetch"))
    try:
        assert cm.ensure_wordnet(download=False) == cm.meteor_mode()
    finally:
        cm._METEOR_MODE = None


def test_ensure_wordnet_noop_when_installed(monkeypatch):
    import nltk

    from rlcf_tpu.metrics import caption_metrics as cm

    monkeypatch.setattr(cm, "_probe_meteor_mode", lambda: "nltk_wordnet")
    monkeypatch.setattr(nltk, "download",
                        lambda *a, **k: pytest.fail("installed corpus must not re-fetch"))
    try:
        assert cm.ensure_wordnet() == "nltk_wordnet"
    finally:
        cm._METEOR_MODE = None


def test_clipscore_eval_exposes_download_nltk_flag():
    from rlcf_tpu.cli.clipscore_eval import get_args

    args = get_args(["cands.json", "imgs", "--download_nltk", "1"])
    assert args.download_nltk == 1
    assert get_args(["cands.json", "imgs"]).download_nltk == 0
