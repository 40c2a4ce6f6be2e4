"""Benchmark CLI (the reference's `clip_benchmark` command,
`src/clip_benchmark/cli.py`).

  python -m leaf_tpu.benchmark.cli eval \
      --model ViT-B-32 --pretrained ckpt.safetensors \
      --dataset imagenet1k --dataset-root /data/imagenet \
      [--task auto] [--language en] [--attack apgd] \
      [--interpolate --beta 0.5 --interpolate-ckpt clean.safetensors] \
      --output '{dataset}_{model}_{task}.json'

  python -m leaf_tpu.benchmark.cli build result1.json result2.json \
      --output benchmark.csv

Tasks: zeroshot_classification (clean / --attack apgd AutoAttack-style
robust), zeroshot_retrieval, linear_probe, image_caption_selection,
captioning (CoCa); `--task auto` infers from the dataset name.
Datasets resolve through `builder.build_dataset` (imagefolder / wds
tars / retrieval json / SugarCrepe json — offline layouts of the
reference's ~40 builders); `--dataset` also accepts a collection name
(vtab, retrieval, imagenet_robustness, sugar_crepe) or a text file of
names.  `--language {en,cn,it,jp,ar,...}` selects classname/template
translations (babel-imagenet for imagenet variants).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import List

from leaf_tpu.utils.logging_utils import setup_logging

LOG = logging.getLogger(__name__)


def _interpolate(params, other, beta: float):
    """θ ← β·θ + (1−β)·θ_other (reference `cli.py:81-88`
    interpolate_state_dict; β=0 gives the clean model)."""
    import jax
    return jax.tree.map(lambda a, b: beta * a + (1 - beta) * b,
                        params, other)


def _expand_datasets(specs: List[str]) -> List[str]:
    from leaf_tpu.benchmark.builder import DATASET_COLLECTIONS
    out: List[str] = []
    for s in specs:
        if s in DATASET_COLLECTIONS:
            out.extend(DATASET_COLLECTIONS[s])
        elif os.path.isfile(s) and s.endswith(".txt"):
            out.extend(l.strip() for l in open(s) if l.strip())
        else:
            out.append(s)
    return out


def _load_model(args, model_name: str, pretrained: str):
    """Create (params, cfg, tokenizer, preprocess) once per model —
    shared across every dataset of an eval run.

    `--model-type` mirrors the reference dispatch
    (`model_loading/__init__.py:9-14`): hf_clip treats the model name as
    an HF repo id (pretrained must be empty/none, `hf_clip.py:9-10`);
    ja_clip requires the optional japanese_clip package, exactly as
    upstream (`japanese_clip.py:36-39`)."""
    from leaf_tpu.models import create_model, get_tokenizer
    from leaf_tpu.models.preprocess import image_transform

    model_type = getattr(args, "model_type", "open_clip")
    if model_type == "ja_clip":
        try:
            import japanese_clip  # noqa: F401
        except ImportError:
            raise ImportError(
                "Install `japanese_clip` by `pip install "
                "git+https://github.com/rinnakk/japanese-clip.git`")
        raise NotImplementedError(
            "ja_clip models use rinna's own loader; no JAX port exists "
            "— use --model-type open_clip with an hf-hub: id instead")
    if model_type == "hf_clip":
        if pretrained not in ("", "none", None):
            raise ValueError(
                "--model-type hf_clip takes the HF repo id as --model; "
                "--pretrained must be empty (reference hf_clip.py:9)")
        if not model_name.startswith("hf-hub:"):
            model_name = "hf-hub:" + model_name
    model = create_model(model_name, pretrained or None,
                         precision=args.precision)
    cfg = model.cfg
    params = model.params
    if args.interpolate:
        if not args.interpolate_ckpt:
            raise ValueError("--interpolate needs --interpolate-ckpt")
        from leaf_tpu.models.interop import load_pretrained
        other = load_pretrained(args.interpolate_ckpt, cfg)
        params = _interpolate(params, other, args.beta)
    tokenizer = get_tokenizer(model_name)
    preprocess = image_transform(cfg.vision.image_size, do_normalize=False)
    return params, cfg, tokenizer, preprocess


def run_one(args, dataset_name: str, model_name: str, pretrained: str,
            loaded=None) -> dict:
    from leaf_tpu.benchmark.builder import build_dataset

    if args.task == "captioning":
        # captioning needs a CoCa model (its own config registry and
        # param layout) — skip the CLIP bundle entirely
        import jax

        from leaf_tpu.benchmark.captioning import evaluate_captioning
        from leaf_tpu.models import get_tokenizer
        from leaf_tpu.models.coca import create_coca_model
        from leaf_tpu.models.preprocess import image_transform

        coca, coca_cfg = create_coca_model(model_name, pretrained or None)
        # the MODEL's tokenizer: CoCa text context is 76 and the
        # roberta variant needs its HF tokenizer — the bare default
        # would decode roberta ids with the CLIP BPE vocab
        tokenizer = get_tokenizer(model_name)
        preprocess = image_transform(coca_cfg.vision.image_size,
                                     do_normalize=False)
        ds, _, _, _ = build_dataset(
            dataset_name, args.dataset_root, preprocess, split=args.split,
            batch_size=args.batch_size, language=args.language,
            annotation_file=args.annotation_file)
        metrics = evaluate_captioning(
            coca, coca_cfg, tokenizer, _captioning_batches(ds),
            jax.random.PRNGKey(args.seed))
        return _emit_result(args, dataset_name, model_name, pretrained,
                            "captioning", metrics)

    params, cfg, tokenizer, preprocess = \
        loaded if loaded is not None \
        else _load_model(args, model_name, pretrained)

    task = args.task
    ds, default_task, classnames, templates = build_dataset(
        dataset_name, args.dataset_root, preprocess, split=args.split,
        batch_size=args.batch_size, language=args.language,
        annotation_file=args.annotation_file)
    if task == "auto":
        task = default_task

    if task == "zeroshot_classification":
        from leaf_tpu.benchmark import evaluate_zeroshot_classification
        metrics = evaluate_zeroshot_classification(
            params, cfg, tokenizer, ds, classnames, templates,
            attack=args.attack, eps=args.eps / 255.0,
            n_iter=args.attack_iters)
    elif task == "zeroshot_retrieval":
        from leaf_tpu.benchmark import evaluate_zeroshot_retrieval
        metrics = evaluate_zeroshot_retrieval(
            params, cfg, tokenizer, ds.image_batches(), ds.text, ds.img2txt,
            recall_ks=tuple(args.recall_k))
    elif task == "image_caption_selection":
        from leaf_tpu.benchmark.image_caption_selection import (
            evaluate_image_caption_selection,
        )
        metrics = evaluate_image_caption_selection(params, cfg, tokenizer,
                                                   ds)
    elif task == "linear_probe":
        from leaf_tpu.benchmark import evaluate_linear_probe
        from leaf_tpu.data.imagenet import ImageFolderDataset
        root = args.dataset_root.format(dataset=dataset_name,
                                        language=args.language)
        train_ds = ImageFolderDataset(os.path.join(root, "train"),
                                      preprocess,
                                      batch_size=args.batch_size)
        test_ds = ImageFolderDataset(
            os.path.join(root, args.split if os.path.isdir(
                os.path.join(root, args.split)) else "val"),
            preprocess, batch_size=args.batch_size)
        metrics = evaluate_linear_probe(
            params, cfg, train_ds, test_ds,
            n_classes=len(train_ds.classes), lr=args.fewshot_lr,
            epochs=args.fewshot_epochs, fewshot_k=args.fewshot_k)
    else:
        raise ValueError(f"unknown task {task}")

    return _emit_result(args, dataset_name, model_name, pretrained, task,
                        metrics)


def _captioning_batches(ds):
    """Adapt a retrieval-style dataset (image_batches + text/img2txt)
    into the (images, per-image caption lists) batches
    `evaluate_captioning` consumes."""
    img_id = 0
    for images in ds.image_batches():
        refs = []
        for _ in range(len(images)):
            refs.append([ds.text[t] for t in ds.img2txt[img_id]])
            img_id += 1
        yield images, refs


def _emit_result(args, dataset_name: str, model_name: str, pretrained: str,
                 task: str, metrics: dict) -> dict:
    result = {"model": model_name, "pretrained": pretrained,
              "task": task, "dataset": dataset_name,
              "language": args.language, "metrics": metrics}
    if task == "zeroshot_classification" and args.attack:
        # only the classification task implements the attack — stamping
        # attack metadata on other tasks would present clean numbers
        # as robust ones
        result.update({"attack": args.attack, "eps": args.eps,
                       "iterations_adv": args.attack_iters})
    else:
        result["attack"] = "none"
    if args.output:
        out = args.output.format(dataset=dataset_name.replace("/", "-"),
                                 model=model_name.replace("/", "-"),
                                 pretrained=os.path.basename(
                                     pretrained or "scratch"),
                                 task=task, language=args.language)
        with open(out, "w") as f:
            json.dump(result, f, indent=2, default=float)
        LOG.info("wrote %s", out)
    print(json.dumps(result, default=float))
    return result


def run_eval(args) -> List[dict]:
    from leaf_tpu.benchmark.model_collection import expand_models
    models = expand_models(args.model, args.pretrained)
    if len(models) > 1 and args.output and "{model}" not in args.output \
            and "{pretrained}" not in args.output:
        # without a model placeholder every model would overwrite the
        # same result file
        head, tail = os.path.split(args.output)
        args.output = os.path.join(head, "{model}_{pretrained}_" + tail)
        LOG.warning("multiple models with a model-less --output template; "
                    "using %s", args.output)
    out = []
    for (m, p) in models:
        loaded = None if args.task == "captioning" \
            else _load_model(args, m, p)
        out.extend(run_one(args, name, m, p, loaded=loaded)
                   for name in _expand_datasets(args.dataset))
    return out


def run_build(args):
    """Merge result JSONs into one CSV (`cli.py` build subcommand)."""
    import csv
    rows = []
    meta = ["model", "pretrained", "task", "dataset", "language",
            "attack", "eps", "iterations_adv"]
    fields: List[str] = list(meta)
    for path in args.files:
        with open(path) as f:
            r = json.load(f)
        row = {k: r.get(k) for k in meta}
        for k, v in r.get("metrics", {}).items():
            row[k] = v
            if k not in fields:
                fields.append(k)
        rows.append(row)
    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    LOG.info("wrote %s (%d rows)", args.output, len(rows))
    return rows


def run_reformat(args):
    """Pivot a merged CSV into a models × datasets accuracy table
    (reference `src/clip_benchmark/reformat_csv.py`: acc1 → %, dataset
    prefixes stripped, rows indexed by model/pretrained/attack/eps)."""
    import pandas as pd

    df = pd.read_csv(args.input)
    df["acc1"] = (df["acc1"] * 100).round(2)
    df["dataset"] = df["dataset"].str.replace(r"^(wds/vtab/|wds/)", "",
                                              regex=True)
    index_cols = [c for c in ("model", "pretrained", "attack", "eps",
                              "iterations_adv") if c in df.columns]
    pivot = df.pivot_table(values="acc1", index=index_cols,
                           columns=["dataset"]).reset_index()
    pivot.to_csv(args.output, index=False)
    print(pivot.to_csv(index=False))
    LOG.info("wrote %s", args.output)
    return pivot


def main(argv: List[str] | None = None):
    p = argparse.ArgumentParser("leaf_tpu benchmark")
    sub = p.add_subparsers(dest="command", required=True)
    e = sub.add_parser("eval")
    e.add_argument("--model", required=True, nargs="+",
                   help="model name(s), `model,pretrained` pairs, a "
                        "collection (openclip_base, openai, leaf, fare, "
                        "openclip_all), or a .txt file of pairs")
    e.add_argument("--pretrained", default="")
    e.add_argument("--model-type", default="open_clip",
                   choices=["open_clip", "hf_clip", "ja_clip"],
                   help="model loading route (reference model_loading/"
                        "__init__.py TYPE2FUNC): open_clip = the native "
                        "factory; hf_clip = --model is an HF repo id "
                        "(LEAF-CLIP releases); ja_clip needs the optional "
                        "japanese_clip package")
    e.add_argument("--precision", default="fp32")
    e.add_argument("--task", default="auto",
                   choices=["auto", "zeroshot_classification",
                            "zeroshot_retrieval", "linear_probe",
                            "image_caption_selection", "captioning"])
    e.add_argument("--dataset", nargs="+", default=["imagefolder"],
                   help="dataset name(s), a collection (vtab, retrieval, "
                        "imagenet_robustness, sugar_crepe), or a .txt list")
    e.add_argument("--dataset-root", required=True,
                   help="root dir; may template {dataset}/{language}")
    e.add_argument("--split", default="test")
    e.add_argument("--language", default="en")
    e.add_argument("--annotation-file", default="")
    e.add_argument("--batch-size", type=int, default=64)
    e.add_argument("--recall-k", type=int, nargs="+", default=[1, 5, 10])
    e.add_argument("--attack", default=None, choices=[None, "apgd"])
    e.add_argument("--eps", type=float, default=2.0, help="/255 units")
    e.add_argument("--attack-iters", type=int, default=100)
    e.add_argument("--interpolate", action="store_true", default=False,
                   help="interpolate params with --interpolate-ckpt")
    e.add_argument("--beta", type=float, default=0.5,
                   help="interpolation weight (0 = the other model)")
    e.add_argument("--interpolate-ckpt", default="")
    e.add_argument("--fewshot-k", type=int, default=-1)
    e.add_argument("--fewshot-lr", type=float, default=0.1)
    e.add_argument("--fewshot-epochs", type=int, default=100)
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--output", default=None,
                   help="may template {dataset}/{model}/{task}/{language}")
    b = sub.add_parser("build")
    b.add_argument("files", nargs="+")
    b.add_argument("--output", default="benchmark.csv")
    r = sub.add_parser("reformat")
    r.add_argument("input")
    r.add_argument("--output", default="pivoted.csv")
    args = p.parse_args(argv)
    setup_logging()
    if args.command == "eval":
        return run_eval(args)
    if args.command == "reformat":
        return run_reformat(args)
    return run_build(args)


if __name__ == "__main__":
    main()
