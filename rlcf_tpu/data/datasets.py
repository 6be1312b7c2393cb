"""Dataset loaders producing numpy batches for the episode stream.

Covers the reference's classification data plumbing (`TPT/data/datautils.py`,
`TPT/data/fewshot_datasets.py`): directory-per-class ImageFolder layouts for
ImageNet and its OOD variants (with the ImageNet-C corruption/level subpath),
Zhou-split JSON datasets for the fine-grained sets, plus a synthetic dataset
for tests/benches on hosts without data.

All loaders expose ``__len__`` and ``__getitem__ -> (uint8 HWC image, label)``
and an ``iter_batches`` helper that yields preprocessed image batches.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .transforms import preprocess_pil, load_image
from ..utils.registry import Registry

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")

# Dataset-id -> directory name, matching `TPT/data/datautils.py:22-39`.
ID_TO_DIRNAME = {
    "I": "ImageNet",
    "A": "imagenet-a",
    "K": "ImageNet-Sketch",
    "R": "imagenet-r",
    "V": "imagenetv2-matched-frequency-format-val",
    "C": "imagenet-c",
    "flower102": "oxford_flowers",
    "dtd": "dtd",
    "pets": "oxford_pets",
    "cars": "stanford_cars",
    "ucf101": "ucf101",
    "caltech101": "caltech-101",
    "food101": "food-101",
    "sun397": "sun397",
    "aircraft": "fgvc_aircraft",
    "eurosat": "eurosat",
}

# Fine-grained: (image subdir, Zhou split json), `TPT/data/fewshot_datasets.py:51-70`.
JSON_SPLITS = {
    "flower102": ("jpg", "split_zhou_OxfordFlowers.json"),
    "food101": ("images", "split_zhou_Food101.json"),
    "dtd": ("images", "split_zhou_DescribableTextures.json"),
    "pets": ("images", "split_zhou_OxfordPets.json"),
    "sun397": ("SUN397", "split_zhou_SUN397.json"),
    "caltech101": ("101_ObjectCategories", "split_zhou_Caltech101.json"),
    "ucf101": ("UCF-101-midframes", "split_zhou_UCF101.json"),
    "cars": ("cars_test", "split_zhou_StanfordCars.json"),
    "eurosat": ("2750", "split_zhou_EuroSAT.json"),
}


class ImageFolderDataset:
    """Directory-per-class layout; classes sorted by name (torchvision order)."""

    def __init__(self, root: str):
        self.root = root
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.samples: List[Tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            cls_dir = os.path.join(root, cls)
            for dirpath, _, files in sorted(os.walk(cls_dir)):
                for f in sorted(files):
                    if f.lower().endswith(IMAGE_EXTENSIONS):
                        self.samples.append((os.path.join(dirpath, f), label))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Tuple[np.ndarray, int]:
        path, label = self.samples[idx]
        return load_image(path), label

    def sample_ref(self, idx) -> Tuple[str, int]:
        """(absolute file path, label) without decoding — for native loaders."""
        return self.samples[idx]


class JsonSplitDataset:
    """Zhou-split JSON dataset: {"train"|"val"|"test": [[path, label, name], ...]}."""

    def __init__(self, image_root: str, json_path: str, mode: str = "test", n_shot: Optional[int] = None):
        with open(json_path) as fh:
            samples = json.load(fh)[mode]
        self.image_root = image_root
        self.samples = [(s[0], int(s[1])) for s in samples]
        if n_shot is not None:
            import random

            by_class = {}
            for i, (_, label) in enumerate(self.samples):
                by_class.setdefault(label, []).append(i)
            keep = []
            for label in sorted(by_class):
                random.seed(0)
                keep.extend(random.sample(by_class[label], n_shot))
            self.samples = [self.samples[i] for i in keep]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Tuple[np.ndarray, int]:
        rel, label = self.samples[idx]
        return load_image(os.path.join(self.image_root, rel)), label

    def sample_ref(self, idx) -> Tuple[str, int]:
        rel, label = self.samples[idx]
        return os.path.join(self.image_root, rel), label


class AircraftDataset:
    """FGVC-Aircraft test split from images_variant_test.txt (`TPT/data/fewshot_datasets.py:87`)."""

    def __init__(self, root: str, mode: str = "test"):
        self.image_root = os.path.join(root, "images")
        with open(os.path.join(root, "variants.txt")) as fh:
            variants = [ln.strip() for ln in fh if ln.strip()]
        self.classes = variants
        index = {v: i for i, v in enumerate(variants)}
        self.samples = []
        with open(os.path.join(root, f"images_variant_{mode}.txt")) as fh:
            for ln in fh:
                ln = ln.strip()
                if not ln:
                    continue
                img_id, variant = ln.split(" ", 1)
                self.samples.append((f"{img_id}.jpg", index[variant]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        rel, label = self.samples[idx]
        return load_image(os.path.join(self.image_root, rel)), label

    def sample_ref(self, idx) -> Tuple[str, int]:
        rel, label = self.samples[idx]
        return os.path.join(self.image_root, rel), label


class BongardHOIDataset:
    """Bongard-HOI few-shot tasks (`TPT/data/hoi_dataset.py:26-115`).

    Each item is a task: positive/negative support image paths, the two query
    images (one per polarity), and the text annotation. Split json format:
    ``data/bongard_splits/bongard_hoi_{mode}_{split}.json`` with
    ``[neg_samples, pos_samples, ..., annotation]`` entries.
    """

    def __init__(self, data_root: str, split: str = "unseen_obj_unseen_act", mode: str = "test"):
        self.data_root = data_root
        path = os.path.join(data_root, "data", "bongard_splits", f"bongard_hoi_{mode}_{split}.json")
        with open(path) as fh:
            items = json.load(fh)
        self.tasks = []
        for task in items:
            self.tasks.append(
                {
                    "neg_samples": [s["im_path"] for s in task[0]],
                    "pos_samples": [s["im_path"] for s in task[1]],
                    "annotation": task[-1].replace("++", " "),
                }
            )

    def __len__(self):
        return len(self.tasks)

    def resolve(self, rel_path: str) -> str:
        path = os.path.join(self.data_root, rel_path.replace("./", ""))
        if not os.path.isfile(path):
            # the published file lists occasionally point at the wrong split
            swap = path.replace("/val", "/train") if "/pic/image/val" in path else path.replace("/train", "/val")
            if os.path.isfile(swap):
                return swap
        return path

    def __getitem__(self, idx):
        import random as _random

        task = self.tasks[idx]
        # The reference shuffles each polarity with a fixed seed before the
        # support/query split (`hoi_dataset.py:84-89`): deterministic, but the
        # query is not simply the file-order last sample. A local Random(0)
        # yields the identical shuffle without clobbering the process-global
        # RNG state mid-run.
        rng = _random.Random(0)
        pos = list(task["pos_samples"])
        neg = list(task["neg_samples"])
        rng.shuffle(pos)
        rng.shuffle(neg)
        load = lambda rel: load_image(self.resolve(rel))
        return {
            "pos_support": [load(p) for p in pos[:-1]],
            "neg_support": [load(p) for p in neg[:-1]],
            "pos_query": load(pos[-1]),
            "neg_query": load(neg[-1]),
            "annotation": task["annotation"],
        }


class SyntheticDataset:
    """Deterministic random images for tests/benches without real data."""

    def __init__(self, n: int = 64, n_classes: int = 10, size: int = 256, seed: int = 0):
        self.n = n
        self.n_classes = n_classes
        self.size = size
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        img = rng.integers(0, 256, size=(self.size, self.size, 3), dtype=np.uint8)
        return img, int(rng.integers(0, self.n_classes))


def _register_builders():
    """Register every dataset id with the global :class:`Registry`.

    The registry is the LAVIS ``Registry`` equivalent
    (`retrieval/lavis/common/registry.py:9-329`); ``build_dataset`` dispatches
    through it so external code can add datasets without editing this module:

        Registry.register("dataset", "my_set")(lambda root, **kw: MySet(root))
    """
    if "synthetic" in Registry._stores.get("dataset", {}):  # module re-import
        return
    reg = lambda name: Registry.register("dataset", name)
    reg("synthetic")(lambda root, **kw: SyntheticDataset())
    reg("I")(lambda root, **kw: ImageFolderDataset(os.path.join(root, ID_TO_DIRNAME["I"], "val")))
    for sid in ("A", "K", "R", "V"):
        reg(sid)(lambda root, _sid=sid, **kw: ImageFolderDataset(os.path.join(root, ID_TO_DIRNAME[_sid])))
    reg("C")(
        lambda root, corruption="defocus_blur", level="5", **kw: ImageFolderDataset(
            os.path.join(root, ID_TO_DIRNAME["C"], corruption, level)
        )
    )
    reg("aircraft")(
        lambda root, mode="test", **kw: AircraftDataset(os.path.join(root, ID_TO_DIRNAME["aircraft"]), mode=mode)
    )
    for sid in JSON_SPLITS:
        subdir, split_json = JSON_SPLITS[sid]

        def _json_builder(root, mode="test", n_shot=None, _sid=sid, _sub=subdir, _json=split_json, **kw):
            base = os.path.join(root, ID_TO_DIRNAME[_sid])
            return JsonSplitDataset(os.path.join(base, _sub), os.path.join(base, _json), mode=mode, n_shot=n_shot)

        reg(sid)(_json_builder)
    reg("bongard_hoi")(
        lambda root, mode="test", split="unseen_obj_unseen_act", **kw: BongardHOIDataset(root, split=split, mode=mode)
    )


_register_builders()


def build_dataset(
    set_id: str,
    data_root: str,
    mode: str = "test",
    n_shot: Optional[int] = None,
    corruption: str = "defocus_blur",
    level: str = "5",
):
    """Resolve a dataset id to a loader (mirrors `TPT/data/datautils.py:42-72`)
    via the registry (the LAVIS-pattern dispatch, SURVEY §2.2 row 26)."""
    try:
        builder = Registry.get("dataset", set_id)
    except KeyError:
        raise KeyError(f"unknown dataset id {set_id!r}; known: {Registry.list('dataset')}") from None
    return builder(data_root, mode=mode, n_shot=n_shot, corruption=corruption, level=level)


def iter_batches(
    dataset,
    batch_size: int,
    resolution: int = 224,
    shuffle: bool = True,
    seed: int = 0,
    limit: Optional[int] = None,
    decode: str = "pil",
    workers: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (images [B,R,R,3] float32, labels [B]) with host preprocessing.

    ``decode="native"`` threads file-path batches through the C++ decode+
    canonicalize call (datasets without paths fall back to PIL per image).
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if limit is not None:
        order = order[:limit]
    sample_ref = getattr(dataset, "sample_ref", None) if decode == "native" else None
    for start in range(0, len(order), batch_size):
        idxs = order[start : start + batch_size]
        if sample_ref is not None:
            from .transforms import preprocess_many

            refs = [sample_ref(int(i)) for i in idxs]
            imgs = np.stack(preprocess_many(
                [r[0] for r in refs], resolution, decode="native", workers=workers
            ))
            labels = np.array([r[1] for r in refs], dtype=np.int32)
        else:
            imgs = np.stack([preprocess_pil(dataset[i][0], resolution) for i in idxs])
            labels = np.array([dataset[i][1] for i in idxs], dtype=np.int32)
        yield imgs, labels


def iter_canonical(
    dataset,
    size: int = 256,
    shuffle: bool = True,
    seed: int = 0,
    limit: Optional[int] = None,
    workers: int = 0,
    decode: str = "pil",
) -> Iterator[Tuple[np.ndarray, int]]:
    """Yield (canonical [size, size, 3] u8, label) for the episode stream.

    Same (shuffle, seed, limit)-determined order as ``iter_batches``; the bicubic short-side
    resize + center crop happens at decode time instead of on the consumer
    thread. ``decode="native"`` runs file-bytes -> canonical square in one
    C++ call (JPEG/PNG; `native/rlcf_host.cpp::rlcf_load_canonical`) that
    releases the GIL, so ``workers`` threads get real decode parallelism —
    the role of the reference's DataLoader worker processes
    (`TPT/tpt_cls_rl.py:214-220`). Decode is bit-identical to PIL; the native
    resize is the AugMix pipeline's kernel (within ~±2 gray of PIL bicubic on
    ~0.03% of pixels). Anything the native path can't handle (synthetic
    datasets, exotic formats, corrupt files) falls back to PIL per image.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if limit is not None:
        order = order[:limit]

    from .transforms import center_crop, load_canonical, resize_short_side_pil

    use_native = False
    if decode == "native":
        try:
            from .native import decode_available

            use_native = decode_available()  # resolve/build once, pre-pool
        except Exception:
            use_native = False
    sample_ref = getattr(dataset, "sample_ref", None)

    def load_one(i) -> Tuple[np.ndarray, int]:
        i = int(i)
        if use_native and sample_ref is not None:
            path, label = sample_ref(i)
            arr = load_canonical(path, size)
            if arr is not None:
                return arr, label
        img, label = dataset[i]
        return center_crop(resize_short_side_pil(img, size), size), label

    if workers == 0:
        workers = min(8, os.cpu_count() or 1) if use_native else 1
    if workers <= 1:
        for i in order:
            yield load_one(i)
        return

    # Bounded-window thread pool: at most 2*workers decoded images in flight,
    # results yielded in order.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending: deque = deque()
        for i in order:
            pending.append(ex.submit(load_one, i))
            if len(pending) >= 2 * workers:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


class PrefetchIterator:
    """Background-thread prefetch over any iterator (the LAVIS
    ``PrefetchLoader`` idea, `lavis/datasets/datasets/dataloader_utils.py:127`):
    host-side decode/augment overlaps device compute."""

    _END = object()

    def __init__(self, iterable, depth: int = 4):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as exc:  # propagate into the consumer
                self._err = exc
            finally:
                self._q.put(self._END)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
