"""Metrics/observability: meters, run logs, caption traces.

Mirrors the reference's logging surface: ``AverageMeter``/``ProgressMeter``
(`TPT/utils/tools.py:22-81`), append-only ``log.txt`` + ``results.json``
(`TPT/tpt_cls_rl.py:199-207`), jsonl result lines
(`lavis/tasks/retrieval.py:103-106`), and the per-image sampled-caption/reward
trace (`TxtLogger`, `caption/capdec_tta.py:22-46`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg
        )


class ProgressMeter:
    def __init__(self, total: int, meters: Iterable[AverageMeter], prefix: str = ""):
        self.total = total
        self.meters = list(meters)
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + f"[{batch}/{self.total}]"] + [str(m) for m in self.meters]
        print("\t".join(entries), flush=True)


class RunLogger:
    """Append-only log.txt + results.json + jsonl per-dataset lines."""

    def __init__(self, output_dir: str):
        self.dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self._t0 = time.time()

    def text(self, *lines: str):
        with open(os.path.join(self.dir, "log.txt"), "a") as fh:
            for line in lines:
                fh.write(line.rstrip("\n") + "\n")
        for line in lines:
            print(line, flush=True)

    def result_line(self, payload: dict, name: str = "evaluate.txt"):
        with open(os.path.join(self.dir, name), "a") as fh:
            fh.write(json.dumps(payload) + "\n")

    def results_json(self, results: dict, name: str = "results.json"):
        with open(os.path.join(self.dir, name), "a+") as fh:
            json.dump(results, fh, indent=4)

    def elapsed_line(self, label: str) -> str:
        dt = time.time() - self._t0
        return f"The running time for {label} is {dt // 3600:.1f} Hour {dt % 3600 / 60:.1f} Minute"


class CaptionTraceLogger:
    """Per-image sampled-caption/reward trace (`capdec_tta.py:22-46`)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a")

    def log_id(self, image_id: str):
        self._fh.write(f"\n==== {image_id} ====\n")

    def log_samples(self, captions, rewards):
        for c, r in zip(captions, rewards):
            self._fh.write(f"  [{r:+.4f}] {c}\n")

    def log_final(self, caption: str):
        self._fh.write(f"  FINAL: {caption}\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
