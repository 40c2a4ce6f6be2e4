"""HuggingFace-backed tokenizers (HF text towers + SigLIP).

Re-expression of the reference's `HFTokenizer` and `SigLipTokenizer`
(`/root/reference/src/open_clip/tokenizer.py:403-520`) returning numpy
int32 `[B, context_length]` buffers (the shape every leaf_tpu scorer /
train step consumes) instead of torch tensors.
"""
from __future__ import annotations

import string
from typing import List, Optional, Union

import numpy as np

from leaf_tpu.tokenizer.bpe import basic_clean, whitespace_clean

DEFAULT_CONTEXT_LENGTH = 77


def canonicalize_text(text: str, *, keep_punctuation_exact_string=None,
                      trans_punctuation: dict = str.maketrans(
                          "", "", string.punctuation)) -> str:
    """Lowercase + strip punctuation (big_vision prompt canonicalizer,
    reference `tokenizer.py:104-131`)."""
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(trans_punctuation)
            for part in text.split(keep_punctuation_exact_string))
    else:
        text = text.translate(trans_punctuation)
    text = text.lower()
    text = " ".join(text.split())
    return text.strip()


def get_clean_fn(kind: str):
    if kind == "canonicalize":
        return lambda x: canonicalize_text(basic_clean(x))
    if kind == "lower":
        return lambda x: whitespace_clean(basic_clean(x)).lower()
    if kind == "whitespace":
        return lambda x: whitespace_clean(basic_clean(x))
    raise ValueError(f"invalid clean function {kind!r}")


class HFTokenizer:
    """HuggingFace AutoTokenizer wrapper (reference `tokenizer.py:403`).

    Produces fixed-shape numpy int32 ids, max-length padded/truncated;
    `strip_sep_token` zeroes the SEP id (used by some text towers whose
    pooler must not see it)."""

    def __init__(self, tokenizer_name: str,
                 context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
                 clean: str = "whitespace", strip_sep_token: bool = False,
                 language: Optional[str] = None, **kwargs):
        from transformers import AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_name,
                                                       **kwargs)
        set_lang_fn = getattr(self.tokenizer,
                              "set_src_lang_special_tokens", None)
        if callable(set_lang_fn):
            self.set_lang_fn = set_lang_fn
        if language is not None:
            self.set_language(language)
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.strip_sep_token = strip_sep_token

    def save_pretrained(self, dest: str):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "set a context length in init or call"
        texts = [self.clean_fn(t) for t in texts]
        ids = self.tokenizer.batch_encode_plus(
            texts, return_tensors="np", max_length=context_length,
            padding="max_length", truncation=True).input_ids
        ids = np.asarray(ids, dtype=np.int32)
        if self.strip_sep_token:
            ids = np.where(ids == self.tokenizer.sep_token_id, 0, ids)
        return ids

    def set_language(self, src_lang: str):
        if hasattr(self, "set_lang_fn"):
            self.set_lang_fn(src_lang)
        else:
            import warnings
            warnings.warn("Cannot set language for the tokenizer.")

    def decode(self, ids) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)


class SigLipTokenizer:
    """T5-sentencepiece tokenizer for SigLIP towers (reference
    `tokenizer.py:463-520`): canonicalized text, pad/eos id forced to
    1, default context 64."""

    VOCAB_FILES = {
        # english, vocab_size=32_000
        "c4-en": "http://storage.googleapis.com/t5-data/vocabs/"
                 "cc_en.32000/sentencepiece.model",
        # multilingual (mT5/PaLI), vocab_size=250_000
        "mc4": "http://storage.googleapis.com/t5-data/vocabs/"
               "mc4.250000.100extra/sentencepiece.model",
    }

    def __init__(self, tokenizer_name: str,
                 context_length: Optional[int] = 64):
        from transformers import T5TokenizerFast
        if tokenizer_name in self.VOCAB_FILES:
            import tempfile
            import urllib.request
            url = self.VOCAB_FILES[tokenizer_name]
            with tempfile.NamedTemporaryFile("wb", suffix=".model",
                                             delete=False) as dst:
                with urllib.request.urlopen(url) as src:
                    dst.write(src.read())
                path = dst.name
            self.tokenizer = T5TokenizerFast(path, legacy=False)
        else:
            self.tokenizer = T5TokenizerFast(tokenizer_name, legacy=False)
        self.tokenizer.pad_token_id = 1
        self.tokenizer.eos_token_id = 1
        self.context_length = context_length

    def save_pretrained(self, dest: str):
        self.tokenizer.save_pretrained(dest)

    def __call__(self, texts: Union[str, List[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        assert context_length, "set a context length in init or call"
        texts = [canonicalize_text(basic_clean(t)) for t in texts]
        out = self.tokenizer(texts, return_tensors="np",
                             max_length=context_length,
                             padding="max_length", truncation=True)
        return np.asarray(out.input_ids, dtype=np.int32)
