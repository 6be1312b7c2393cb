"""A/B the pure-Python caption scorers against pycocoevalcap (when importable).

Writes ``tests/fixtures/metric_backend_ab.json``:
  - ``own``: metrics from this repo's scorers on the committed golden set;
  - ``pycoco`` + ``delta``: the reference backend's numbers and per-metric
    deviations, recorded only where pycocoevalcap (+ Java) is importable —
    this zero-egress environment cannot run it, so the committed fixture pins
    the own-impl values and carries ``pycoco: null`` until someone runs this
    tool in a connected environment (RUNBOOK).

The golden set is fixed here (not random): multi-reference captions with
punctuation/case/contraction/hyphen/number cases chosen to stress the PTB
tokenizer approximation (`clipscore/generation_eval_utils.py:43-60`).

Run: python tools/metric_backend_ab.py
"""

import json
import os

GOLDEN = [
    # (candidate, [references])
    ("a man riding a wave on top of a surfboard.",
     ["a surfer riding a large wave in the ocean.",
      "a man on a surfboard rides a breaking wave.",
      "someone surfs a big wave near the shore."]),
    ("Two dogs play with a red frisbee in the park",
     ["two dogs are playing with a frisbee on the grass.",
      "a pair of dogs chase a red frisbee at a park.",
      "dogs playing fetch with a flying disc outside."]),
    ("there isn't a cat on the well-worn sofa",
     ["a cat sleeps on an old couch.",
      "an orange cat is curled up on a worn-out sofa.",
      "the couch has a sleeping cat on it."]),
    ("a group of 3 people standing next to a yellow taxi-cab.",
     ["three people wait beside a yellow taxi.",
      "a group of people standing near a cab on the street.",
      "3 friends stand by a taxi cab downtown."]),
    ("A kitchen with stainless steel appliances and wooden cabinets,",
     ["a modern kitchen featuring steel appliances.",
      "wooden cabinets line a kitchen with a steel fridge.",
      "the kitchen has wood cabinets and metal appliances."]),
    ("the pizza's toppings include mushrooms & green peppers",
     ["a pizza topped with mushrooms and peppers.",
      "mushroom and green pepper pizza on a plate.",
      "a close-up of a veggie pizza with mushrooms."]),
    ("a blue and white train traveling down train tracks.",
     ["a train rides along the tracks through the countryside.",
      "a blue-and-white passenger train on a railway.",
      "the train is moving down the tracks."]),
    ("an empty street",
     ["a quiet street with no cars.",
      "an empty road lined with buildings.",
      "nobody is on the deserted street."]),
]

BOUNDS = {  # |own - pycoco| allowances when the reference backend runs
    "bleu": 0.02,    # per BLEU-n
    "rouge": 0.02,
    "cider": 0.05,   # corpus idf sensitivity
    "meteor": 0.08,  # exact+stem vs METEOR-1.5 jar (documented degradation)
}


def _tokenization_identical(M, refs, cands) -> bool:
    """True iff pycocoevalcap's Java PTBTokenizer emits exactly the tokens
    ptb_tokenize does for every golden caption and reference."""
    from pycocoevalcap.tokenizer.ptbtokenizer import PTBTokenizer

    texts = list(cands) + [r for rs in refs for r in rs]
    caps = {str(i): [{"caption": t}] for i, t in enumerate(texts)}
    java = PTBTokenizer().tokenize(caps)
    return all(java[str(i)][0].split() == M.ptb_tokenize(t)
               for i, t in enumerate(texts))


def main():
    from rlcf_tpu.metrics import caption_metrics as M

    refs = [r for _, r in GOLDEN]
    cands = [c for c, _ in GOLDEN]
    own = {
        "bleu": M.bleu(refs, cands),
        "rouge": M.rouge_l(refs, cands),
        "cider": M.cider_d(refs, cands),
        "meteor": M.meteor(refs, cands),
        "meteor_mode": M.meteor_mode(),
    }
    record = {"n": len(GOLDEN), "own": own, "pycoco": None, "delta": None,
              "bounds": BOUNDS}
    if M.pycocoevalcap_available():
        try:
            py = M.get_all_metrics_pycoco(refs, cands)
            record["pycoco"] = py
            record["delta"] = {
                "bleu": [abs(a - b) for a, b in zip(own["bleu"], py["bleu"])],
                "rouge": abs(own["rouge"] - py["rouge"]),
                "cider": abs(own["cider"] - py["cider"]),
                "meteor": abs(own["meteor"] - py["meteor"]),
            }
            # Token-level A/B: run the reference's Java PTBTokenizer on the
            # golden set and compare with ptb_tokenize. When identical, the
            # n-gram scorers compute the same math and BLEU/ROUGE/CIDEr must
            # agree to float rounding — the test asserts EQUALITY, not bounds.
            record["tokenization_identical"] = _tokenization_identical(M, refs, cands)
        except Exception as e:
            record["pycoco_error"] = str(e)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "metric_backend_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(record, fh, indent=2)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
