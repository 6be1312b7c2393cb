"""Zero-shot CLIP classification eval (`TPT/zero_shot.py`).

Example: python -m rlcf_tpu.cli.zero_shot --test_sets synthetic --limit 32
"""

from __future__ import annotations

import argparse

from . import common


def get_args(argv=None):
    p = argparse.ArgumentParser(description="Zero-shot CLIP eval (TPU)")
    common.add_run_args(p)
    common.add_model_args(p)
    p.add_argument("--ctx_init", default="a_photo_of_a")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--ensemble_archs", nargs="*", default=None, help="multi-arch logit ensemble")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if common.finish_dry_run(args):
        return
    common.enable_cache()
    from ..data.class_names import get_classnames
    from ..data.datasets import build_dataset
    from ..tasks.classification import zero_shot_eval, zero_shot_eval_ensemble
    from ..utils.config import save_hparams
    from ..utils.logging_utils import RunLogger

    logger = RunLogger(args.output)
    save_hparams(args.output, vars(args))
    prefix = (args.ctx_init or "a photo of a").replace("_", " ")

    models = []
    if args.ensemble_archs:
        import dataclasses as dc

        for arch in args.ensemble_archs:
            sub = dc.replace(argparse.Namespace(**vars(args)), arch=arch) if False else argparse.Namespace(**{**vars(args), "arch": arch})
            models.append(common.load_policy(sub))
    else:
        models.append(common.load_policy(args))

    results = {}
    for set_id in args.test_sets.split("/"):
        classnames = ["class_%d" % i for i in range(10)] if set_id == "synthetic" else get_classnames(set_id)
        dataset = build_dataset(set_id, args.data, mode=args.dataset_mode, corruption=args.corruption, level=args.level)
        if len(models) == 1:
            params, cfg = models[0]
            results[set_id] = zero_shot_eval(
                params, cfg, dataset, classnames, prompt_prefix=prefix,
                batch_size=args.batch_size, resolution=args.resolution, limit=args.limit, seed=args.seed,
                decode=args.decode, decode_workers=args.decode_workers,
            )
        else:
            results[set_id] = zero_shot_eval_ensemble(
                models, dataset, classnames, prompt_prefix=prefix,
                batch_size=args.batch_size, resolution=args.resolution, limit=args.limit, seed=args.seed,
                decode=args.decode, decode_workers=args.decode_workers,
            )
        logger.text(f"=> Zero-shot acc on [{set_id}]: {results[set_id]}")
    logger.results_json(results)
    print(results)
    return results


if __name__ == "__main__":
    main()
