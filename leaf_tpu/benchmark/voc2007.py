"""PASCAL VOC 2007 as a classification benchmark.

Re-expression of the reference's `src/clip_benchmark/datasets/
voc2007.py` (itself from dataset-distillation / Cadene): two variants —

  * **voc2007** (`PASCALVoc2007Cropped`): every annotated bounding box
    is one sample, cropped from the image, labelled with its object
    category (single-label classification);
  * **voc2007_multilabel** (`PASCALVoc2007`): whole images with a
    20-dim 0/1 target vector (evaluated with mean average precision,
    `metrics/zeroshot_classification.py:275-285`).

Expects the standard devkit layout under root:
`VOCdevkit/VOC2007/{JPEGImages,Annotations,ImageSets/Main}` (offline —
no auto-download).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Tuple

import numpy as np

OBJECT_CATEGORIES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
_CAT_IDX = {c: i for i, c in enumerate(OBJECT_CATEGORIES)}


def _voc_dir(root: str) -> str:
    d = os.path.join(root, "VOCdevkit", "VOC2007")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"voc2007: expected the devkit layout at {d} (offline — no "
            "auto-download)")
    return d


def read_split(root: str, split: str) -> List[str]:
    d = _voc_dir(root)
    path = os.path.join(d, "ImageSets", "Main", f"{split}.txt")
    with open(path) as f:
        return [l.split()[0] for l in f if l.strip()]


def read_objects(root: str, image_id: str
                 ) -> List[Tuple[int, Tuple[int, int, int, int], bool]]:
    """[(category index, (left, top, right, bottom), difficult), ...]."""
    d = _voc_dir(root)
    xml = ET.parse(os.path.join(d, "Annotations", image_id + ".xml"))
    out = []
    for obj in xml.findall("object"):
        c = _CAT_IDX[obj.find("name").text]
        bb = obj.find("bndbox")
        box = tuple(int(float(bb.find(k).text))
                    for k in ("xmin", "ymin", "xmax", "ymax"))
        diff = obj.find("difficult")
        out.append((c, box, diff is not None and diff.text.strip() == "1"))
    return out


class Voc2007Cropped:
    """One sample per annotated bounding box (reference
    `PASCALVoc2007Cropped`)."""

    def __init__(self, root: str, split: str = "test"):
        self.root = root
        self.classes = list(OBJECT_CATEGORIES)
        self.samples = []
        for image_id in read_split(root, split):
            for label, box, _ in read_objects(root, image_id):
                self.samples.append((image_id, box, label))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from PIL import Image

        image_id, box, label = self.samples[i]
        img = Image.open(os.path.join(_voc_dir(self.root), "JPEGImages",
                                      image_id + ".jpg")).convert("RGB")
        return img.crop(box), label


class Voc2007Multilabel:
    """Whole images with 20-dim 0/1 targets (reference `PASCALVoc2007`)."""

    def __init__(self, root: str, split: str = "test"):
        self.root = root
        self.classes = list(OBJECT_CATEGORIES)
        self.samples = []
        for image_id in read_split(root, split):
            target = np.zeros(len(OBJECT_CATEGORIES), np.float32)
            for label, _, _difficult in read_objects(root, image_id):
                # the reference sets 1 for EVERY bounding box including
                # difficult ones (voc2007.py read_bndbox + labels[..]=1
                # with no difficult filtering)
                target[label] = 1.0
            self.samples.append((image_id, target))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from PIL import Image

        image_id, target = self.samples[i]
        img = Image.open(os.path.join(_voc_dir(self.root), "JPEGImages",
                                      image_id + ".jpg")).convert("RGB")
        return img, target
