"""Dev-only: generate golden token ids from the reference CLIP tokenizer.

Runs the upstream tokenizer (if the read-only reference checkout is present)
on a fixed set of strings and saves the ids as a test fixture. ftfy is stubbed
with an identity fix_text — all fixture strings are clean unicode, for which
ftfy is a no-op.

Usage: python tools/gen_golden_tokens.py
"""

import json
import os
import sys
import types

REFERENCE = "/root/reference/TPT/clip"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden_tokens.json")

FIXTURE_TEXTS = [
    "a photo of a cat.",
    "A photo depicts three sheep standing together on the grass.",
    "the quick brown fox jumps over the lazy dog",
    "ImageNet-A: 7,500 natural adversarial examples!",
    "prompt-tuning with CoOp context vectors",
    "an F/A-18 fighter jet taking off at 45°",
    "café au lait — déjà vu",
    "a bad photo of the {} texture's pattern",
    "",
    "x",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "3.14159 2.71828 1e-5 <|endoftext|> tricks",
]


def main():
    if not os.path.isdir(REFERENCE):
        raise SystemExit("reference checkout not found; fixture regeneration unavailable")
    ftfy_stub = types.ModuleType("ftfy")
    ftfy_stub.fix_text = lambda s: s
    sys.modules.setdefault("ftfy", ftfy_stub)
    sys.path.insert(0, REFERENCE)
    import simple_tokenizer  # noqa: E402  (reference module)

    tok = simple_tokenizer.SimpleTokenizer()
    golden = {"texts": FIXTURE_TEXTS, "ids": [tok.encode(t) for t in FIXTURE_TEXTS]}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(golden, fh)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
