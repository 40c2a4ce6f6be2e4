"""Synthetic dataset: black images + a fixed caption.

The no-data fake backend used by training smoke tests
(reference `/root/reference/data_AT.py:585-632`).
"""
from __future__ import annotations

import random
from typing import Callable, Optional

import numpy as np

from leaf_tpu.data.common import DataInfo


class SyntheticDataset:
    def __init__(self, dataset_size: int = 100, image_size: int = 224,
                 caption: str = "Dummy caption", batch_size: int = 16,
                 seed: int = 0, drop_last: bool = True,
                 preprocess: Optional[Callable] = None):
        self.dataset_size = dataset_size
        self.batch_size = batch_size
        self.caption = caption
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = -1
        if preprocess is not None:
            from PIL import Image
            self.image = preprocess(Image.new("RGB", (image_size, image_size)))
        else:
            self.image = np.zeros((image_size, image_size, 3), np.float32)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    @property
    def num_batches(self) -> int:
        if self.drop_last:
            return self.dataset_size // self.batch_size
        return -(-self.dataset_size // self.batch_size)

    def __iter__(self):
        self.epoch += 1
        order = list(range(self.dataset_size))
        random.Random(self.seed + self.epoch).shuffle(order)
        for b in range(self.num_batches):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            images = np.stack([self.image] * len(idx))
            texts = [self.caption] * len(idx)
            yield images, texts


def get_synthetic_dataset(dataset_size: int, batch_size: int,
                          image_size: int = 224, seed: int = 0,
                          preprocess=None) -> DataInfo:
    ds = SyntheticDataset(dataset_size, image_size, batch_size=batch_size,
                          seed=seed, preprocess=preprocess)
    return DataInfo(ds, num_batches=ds.num_batches, num_samples=dataset_size)
