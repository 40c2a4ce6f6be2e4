"""Data layer: host-side pipelines feeding numpy batches to device.

`get_data` assembles the reference's dataset dict
(`/root/reference/data_AT.py:655-679`): train (wds/csv/synthetic),
optional imagenet-val, and the text-classification eval sets.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

from leaf_tpu.data.common import DataInfo, Prefetcher
from leaf_tpu.data.csv_data import CsvDataset, get_csv_dataset
from leaf_tpu.data.imagenet import ImageFolderDataset, get_imagenet
from leaf_tpu.data.synthetic import SyntheticDataset, get_synthetic_dataset
from leaf_tpu.data.textcls import (
    TextClassificationData,
    char_vocabulary,
    get_text_classification_dataset,
)
from leaf_tpu.data.wds import WdsConfig, WdsDataset, expand_urls, get_wds_dataset

__all__ = [
    "DataInfo", "Prefetcher", "CsvDataset", "get_csv_dataset",
    "ImageFolderDataset", "get_imagenet", "SyntheticDataset",
    "get_synthetic_dataset", "TextClassificationData", "char_vocabulary",
    "get_text_classification_dataset", "WdsConfig", "WdsDataset",
    "expand_urls", "get_wds_dataset", "get_data",
]


def get_data(args, preprocess: Callable, epoch: int = 0,
             process_index: int = 0, process_count: int = 1,
             text_only: bool = False,
             preprocess_val: Optional[Callable] = None
             ) -> Dict[str, object]:
    """Assemble datasets from a parsed-args namespace (see
    `leaf_tpu.train.params`).  `text_only` skips image decode in the
    train tar pipeline (the LEAF text-AT loop discards images).
    `preprocess_val` (default: same as `preprocess`) serves the val /
    imagenet splits so a RandomResizedCrop train transform never leaks
    into evaluation (reference `data.py` keeps the pair separate)."""
    data: Dict[str, object] = {}
    preprocess_val = preprocess_val or preprocess

    length_fn = None
    if getattr(args, "bucket_by_length", False):
        from leaf_tpu.models.factory import get_tokenizer
        tok = get_tokenizer(getattr(args, "model", "") or "")
        if not hasattr(tok, "encode"):
            raise ValueError(
                "--bucket-by-length needs a tokenizer with a raw "
                "encode() (the CLIP byte-BPE one); model "
                f"{getattr(args, 'model', '')!r} resolves to "
                f"{type(tok).__name__}")
        ctx = tok.context_length

        def length_fn(text: str, _tok=tok, _ctx=ctx) -> int:
            return min(len(_tok.encode(text)) + 2, _ctx)  # SOT + ids + EOT

    if getattr(args, "dataset_type", None) == "synthetic":
        data["train"] = get_synthetic_dataset(
            args.train_num_samples or 100, args.batch_size,
            image_size=getattr(args, "image_size", 224), seed=args.seed,
            preprocess=preprocess)
    elif getattr(args, "train_data", None):
        if args.dataset_type in ("webdataset", "auto"):
            data["train"] = get_wds_dataset(
                WdsConfig(urls=args.train_data, batch_size=args.batch_size,
                          is_train=True, seed=args.seed,
                          num_samples=args.train_num_samples,
                          resampled=getattr(args, "dataset_resampled", False),
                          process_index=process_index,
                          process_count=process_count,
                          text_only=text_only,
                          workers=getattr(args, "workers", 4),
                          bucket_by_length=getattr(
                              args, "bucket_by_length", False),
                          length_fn=length_fn,
                          upsampling_factors=(
                              [float(x) for x in
                               args.train_data_upsampling_factors.split("::")]
                              if getattr(args, "train_data_upsampling_factors",
                                         None) else None)),
                preprocess)
        elif args.dataset_type == "csv":
            data["train"] = get_csv_dataset(
                args.train_data, preprocess, args.batch_size,
                img_key=args.csv_img_key, caption_key=args.csv_caption_key,
                sep=args.csv_separator, shuffle=True, seed=args.seed,
                drop_last=True, process_index=process_index,
                process_count=process_count)

    if getattr(args, "val_data", None):
        data["val"] = get_wds_dataset(
            WdsConfig(urls=args.val_data, batch_size=args.batch_size,
                      is_train=False, num_samples=args.val_num_samples),
            preprocess_val)

    if getattr(args, "imagenet_val", None):
        data["imagenet-val"] = get_imagenet(
            args.imagenet_val, preprocess_val, "val", args.batch_size,
            n_val=getattr(args, "n_val_imagenet", 1000), seed=args.seed)

    if getattr(args, "imagenet_v2", None):
        data["imagenet-v2"] = get_imagenet(
            args.imagenet_v2, preprocess_val, "val", args.batch_size,
            n_val=getattr(args, "n_val_imagenet", 1000), seed=args.seed)

    if getattr(args, "val_text_classification", None):
        n = getattr(args, "n_val_text", 200)
        if args.val_text_classification == "synthetic":
            # dress-rehearsal path (docs/REPLICATION.md §5): the same
            # in-training eval code path without HF egress — synthetic
            # sentences with round-robin labels over each dataset's
            # real class/anchor metadata
            from leaf_tpu.data.textcls import TextClassificationData
            from leaf_tpu.evals.textfare import _load_eval_samples
            samples, _ = _load_eval_samples("synthetic", n)
            for name, n_classes in (("agnews", 4), ("sst2", 2)):
                labeled = [dict(s, label=i % n_classes)
                           for i, s in enumerate(samples)]
                data[f"train-{name}"] = TextClassificationData.from_samples(
                    name, labeled)
        else:
            data["train-agnews"] = get_text_classification_dataset(
                "agnews", n_samples=n, test=False)
            data["train-sst2"] = get_text_classification_dataset(
                "sst2", n_samples=n, test=False)

    return data
