"""Benchmark CLI (the reference's `clip_benchmark` command,
`src/clip_benchmark/cli.py`).

  python -m leaf_tpu.benchmark.cli eval \
      --model ViT-B-32 --pretrained ckpt.safetensors \
      --task zeroshot_classification --dataset-root /data/imagenet-val \
      --classnames imagenet --output result.json [--attack apgd]

Tasks: zeroshot_classification (clean / --attack apgd robust),
zeroshot_retrieval (csv of filepath,caption), linear_probe.
Datasets are local image folders / CSVs (the reference's ~40 web
builders assume network access; local layouts cover the same metric
paths).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import List

from leaf_tpu.utils.logging_utils import setup_logging

LOG = logging.getLogger(__name__)


def _load_classnames_and_templates(args):
    from leaf_tpu.models.zero_shot import (
        imagenet_classnames,
        openai_imagenet_templates,
    )
    if args.classnames == "imagenet":
        classnames = imagenet_classnames()
    else:
        with open(args.classnames) as f:
            classnames = json.load(f)
    if args.templates == "openai_imagenet":
        templates = openai_imagenet_templates()
    elif args.templates == "simple":
        templates = ["a photo of a {}."]
    else:
        with open(args.templates) as f:
            templates = json.load(f)
    return classnames, templates


def run_eval(args) -> dict:
    from leaf_tpu.data.imagenet import ImageFolderDataset
    from leaf_tpu.models import create_model, get_tokenizer
    from leaf_tpu.models.preprocess import image_transform

    model = create_model(args.model, args.pretrained or None,
                         precision=args.precision)
    cfg = model.cfg
    tokenizer = get_tokenizer(args.model)
    preprocess = image_transform(cfg.vision.image_size, do_normalize=False)

    if args.task == "zeroshot_classification":
        from leaf_tpu.benchmark import evaluate_zeroshot_classification
        classnames, templates = _load_classnames_and_templates(args)
        ds = ImageFolderDataset(args.dataset_root, preprocess,
                                batch_size=args.batch_size)
        if len(ds.classes) != len(classnames):
            LOG.warning("dataset has %d class dirs but %d classnames",
                        len(ds.classes), len(classnames))
        metrics = evaluate_zeroshot_classification(
            model.params, cfg, tokenizer, ds, classnames, templates,
            attack=args.attack, eps=args.eps / 255.0,
            n_iter=args.attack_iters)
    elif args.task == "zeroshot_retrieval":
        from leaf_tpu.benchmark import evaluate_zeroshot_retrieval
        from leaf_tpu.data.csv_data import CsvDataset
        ds = CsvDataset(args.dataset_root, preprocess,
                        img_key=args.csv_img_key,
                        caption_key=args.csv_caption_key,
                        sep=args.csv_separator,
                        batch_size=args.batch_size)
        captions = list(ds.captions)
        img2txt = {i: [i] for i in range(len(captions))}
        image_loader = (imgs for imgs, _ in ds)
        metrics = evaluate_zeroshot_retrieval(
            model.params, cfg, tokenizer, image_loader, captions, img2txt)
    elif args.task == "linear_probe":
        from leaf_tpu.benchmark import evaluate_linear_probe
        train_ds = ImageFolderDataset(
            os.path.join(args.dataset_root, "train"), preprocess,
            batch_size=args.batch_size)
        test_ds = ImageFolderDataset(
            os.path.join(args.dataset_root, "val"), preprocess,
            batch_size=args.batch_size)
        metrics = evaluate_linear_probe(
            model.params, cfg, train_ds, test_ds,
            n_classes=len(train_ds.classes), lr=args.lp_lr,
            epochs=args.lp_epochs)
    else:
        raise ValueError(f"unknown task {args.task}")

    result = {"model": args.model, "pretrained": args.pretrained,
              "task": args.task, "dataset": args.dataset_root,
              "metrics": metrics}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2, default=float)
        LOG.info("wrote %s", args.output)
    print(json.dumps(result, default=float))
    return result


def main(argv: List[str] | None = None):
    p = argparse.ArgumentParser("leaf_tpu benchmark")
    sub = p.add_subparsers(dest="command", required=True)
    e = sub.add_parser("eval")
    e.add_argument("--model", required=True)
    e.add_argument("--pretrained", default="")
    e.add_argument("--precision", default="fp32")
    e.add_argument("--task", default="zeroshot_classification",
                   choices=["zeroshot_classification", "zeroshot_retrieval",
                            "linear_probe"])
    e.add_argument("--dataset-root", required=True)
    e.add_argument("--classnames", default="imagenet",
                   help="'imagenet' or a JSON file of classnames")
    e.add_argument("--templates", default="openai_imagenet",
                   help="'openai_imagenet', 'simple', or a JSON file")
    e.add_argument("--batch-size", type=int, default=64)
    e.add_argument("--attack", default=None, choices=[None, "apgd"])
    e.add_argument("--eps", type=float, default=2.0, help="/255 units")
    e.add_argument("--attack-iters", type=int, default=100)
    e.add_argument("--csv-separator", default="\t")
    e.add_argument("--csv-img-key", default="filepath")
    e.add_argument("--csv-caption-key", default="title")
    e.add_argument("--lp-lr", type=float, default=0.1)
    e.add_argument("--lp-epochs", type=int, default=100)
    e.add_argument("--output", default=None)
    args = p.parse_args(argv)
    setup_logging()
    if args.command == "eval":
        return run_eval(args)


if __name__ == "__main__":
    main()
