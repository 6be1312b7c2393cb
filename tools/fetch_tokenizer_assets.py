"""One-time fetch of the GPT-2/OPT byte-level BPE assets (connected envs).

The caption pipeline's OPT/GPT-2 backends need ``vocab.json`` + ``merges.txt``
(~1 MB of learned data that cannot be synthesized offline; the build
environment for this repo has zero egress, so they are fetched rather than
bundled — the CLIP BPE, by contrast, ships in-tree like the reference's
`TPT/clip/bpe_simple_vocab_16e6.txt.gz`). After running this once,
``rlcf_tpu.tokenizer_gpt2.find_tokenizer_assets`` resolves the files with no
flags needed.

Usage:
  python tools/fetch_tokenizer_assets.py            # -> rlcf_tpu/assets/gpt2/
  python tools/fetch_tokenizer_assets.py --dest DIR
"""

from __future__ import annotations

import argparse
import os
import urllib.request

# The canonical byte-level BPE shared by GPT-2 and OPT. Primary source is the
# HF gpt2 repo; the facebook/opt-125m files are byte-identical.
SOURCES = {
    "vocab.json": [
        "https://huggingface.co/gpt2/resolve/main/vocab.json",
        "https://huggingface.co/facebook/opt-125m/resolve/main/vocab.json",
    ],
    "merges.txt": [
        "https://huggingface.co/gpt2/resolve/main/merges.txt",
        "https://huggingface.co/facebook/opt-125m/resolve/main/merges.txt",
    ],
}


def fetch(dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for name, urls in SOURCES.items():
        target = os.path.join(dest, name)
        if os.path.isfile(target) and os.path.getsize(target) > 0:
            print(f"{target} already present")
            continue
        last_err = None
        for url in urls:
            try:
                print(f"fetching {url}")
                with urllib.request.urlopen(url, timeout=60) as src, open(target, "wb") as out:
                    out.write(src.read())
                break
            except Exception as e:  # noqa: BLE001 - try the mirror
                last_err = e
        else:
            raise RuntimeError(f"could not fetch {name}: {last_err}")
        print(f"wrote {target} ({os.path.getsize(target)} bytes)")

    # sanity: a known encoding ("Hello world" -> [15496, 995] for GPT-2)
    from rlcf_tpu.tokenizer_gpt2 import Gpt2Tokenizer

    tok = Gpt2Tokenizer(os.path.join(dest, "vocab.json"), os.path.join(dest, "merges.txt"))
    ids = tok.encode("Hello world", add_bos=False)
    assert ids == [15496, 995], f"fetched vocab failed the sanity encoding: {ids}"
    print("sanity encoding OK")


def main():
    p = argparse.ArgumentParser()
    default = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "rlcf_tpu", "assets", "gpt2")
    p.add_argument("--dest", default=default)
    args = p.parse_args()
    fetch(args.dest)


if __name__ == "__main__":
    main()
