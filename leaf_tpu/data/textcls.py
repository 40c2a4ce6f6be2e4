"""Text-classification dataset adapters (AG-News / SST-2 / IMDB / Yelp).

Re-expression of the reference adapters
(`/root/reference/data_AT.py:129-219` + char-vocab builder
`utils_AT.py:30-43`): each dataset carries its class-anchor *images*
(zero-shot text classification is image-anchored), caption templates,
and the character vocabulary of its training split (used as the attack
vocabulary during eval).

HF `datasets` loading requires network/cache; `TextClassificationData`
can also be built directly from in-memory samples (tests, offline).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "models", "assets")

# per-dataset metadata (reference `data_AT.py:136-200`)
_REGISTRY = {
    "agnews": dict(
        hf_id="fancyzhx/ag_news", text_key="text",
        test_split="test", val_from_train=True,
        anchor_images=["politics-0.jpeg", "sports-0.jpeg",
                       "business-0.jpeg", "technology-0.jpeg"],
        captions=["World News", "Sports News", "Business News",
                  "Science and Technology News"],
        template="{}",
    ),
    "sst2": dict(
        hf_id="stanfordnlp/sst2", text_key="sentence",
        test_split="validation", val_from_train=True,
        # Negative/Positive anchors: 78% zero-shot vs 55% for the
        # alternatives (`data_AT.py:159-160`)
        anchor_images=["Negative.png", "Positive.png"],
        captions=["Negative Review", "Positive Review"],
        template="Sentiment: {}",
    ),
    "imdb": dict(
        hf_id="stanfordnlp/imdb", text_key="text",
        test_split="test", val_from_train=False,
        anchor_images=["Negative.png", "Positive.png"],
        captions=["Negative Review", "Positive Review"],
        template="Sentiment: {}",
    ),
    "yelp": dict(
        hf_id="fancyzhx/yelp_polarity", text_key="text",
        # the reference hardcodes key_test_set='test' for yelp even for
        # the class-balanced test=False subset (data_AT.py:193-194) —
        # unlike agnews/sst2 which switch to train/validation
        test_split="test", val_from_train=False,
        anchor_images=["Negative.png", "Positive.png"],
        captions=["Negative Review", "Positive Review"],
        template="Sentiment: {}",
    ),
}

_HF_TO_SHORT = {v["hf_id"]: k for k, v in _REGISTRY.items()}


def char_vocabulary(texts: Sequence[str]) -> List[int]:
    """Attack vocabulary from a corpus: delete (-1) + every character
    appearing in the texts (reference `utils_AT.py:30-43`)."""
    V = {-1}
    for t in texts:
        V.update(ord(c) for c in set(t))
    return list(V)


@dataclasses.dataclass
class TextClassificationData:
    """Samples + metadata for image-anchored zero-shot text eval."""
    short_name: str
    samples: List[Dict]            # [{'text': str, 'label': int}]
    vocab: List[int]               # attack char vocabulary
    anchor_image_paths: List[str]  # one image per class
    captions: List[str]            # one caption per class
    template: str                  # caption template, e.g. 'Sentiment: {}'

    @property
    def num_classes(self) -> int:
        return len(self.captions)

    def anchor_images(self, preprocess) -> "np.ndarray":
        import numpy as np
        from PIL import Image
        return np.stack([preprocess(Image.open(p))
                         for p in self.anchor_image_paths])

    @classmethod
    def from_samples(cls, name: str, samples: List[Dict],
                     vocab: Optional[List[int]] = None) -> "TextClassificationData":
        meta = _REGISTRY[name]
        return cls(
            short_name=name,
            samples=samples,
            vocab=vocab or char_vocabulary([s["text"] for s in samples]),
            anchor_image_paths=[os.path.join(ASSET_DIR, f)
                                for f in meta["anchor_images"]],
            captions=list(meta["captions"]),
            template=meta["template"],
        )


def get_text_classification_dataset(name: str, n_samples: int = 1000,
                                    test: bool = True) -> TextClassificationData:
    """Load via HF datasets, replicating the reference's split/subset
    rules (`data_AT.py:129-219`): test → first n; train ('test'=False)
    → first n/K per class, class-balanced."""
    name = _HF_TO_SHORT.get(name, name)
    # forgiving aliases: the reference's HF ids use underscores
    name = {"ag_news": "agnews", "sst-2": "sst2"}.get(name, name)
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown text-classification dataset {name!r}; "
            f"known: {sorted(_REGISTRY)}")
    meta = _REGISTRY[name]
    from datasets import load_dataset
    ds = load_dataset(meta["hf_id"])
    text_key = meta["text_key"]

    if name == "imdb":
        split = ds[meta["test_split"]]
        half = n_samples // 2
        idx = list(range(half)) + list(range(len(split) - half, len(split)))
        samples = [{"text": split[i][text_key], "label": split[i]["label"]}
                   for i in idx]
    else:
        split_name = meta["test_split"] if test else "train"
        if not test and not meta["val_from_train"]:
            split_name = meta["test_split"]
        split = ds[split_name]
        if test:
            idx = range(min(n_samples, len(split)))
            samples = [{"text": split[i][text_key], "label": split[i]["label"]}
                       for i in idx]
        else:
            K = len(meta["captions"])
            per = n_samples // K
            counts = [0] * K
            samples = []
            for x in split:
                lab = x["label"]
                if counts[lab] < per:
                    samples.append({"text": x[text_key], "label": lab})
                    counts[lab] += 1
                if sum(counts) >= per * K:
                    break

    vocab = char_vocabulary(x[text_key] for x in ds["train"])
    return TextClassificationData.from_samples(name, samples, vocab)
