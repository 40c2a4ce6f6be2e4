"""Tokenizer parity + semantics tests.

Parity gate: HuggingFace's `CLIPTokenizer` is an independent
implementation of the same byte-BPE scheme; we build it offline from the
same merge table asset and require identical ids on a battery of texts,
including attack-style single-character mutations.
"""
import gzip
import json
import random
import string

import numpy as np
import pytest

from leaf_tpu.tokenizer import CLIPTokenizer, get_tokenizer
from leaf_tpu.tokenizer.bpe import DEFAULT_BPE_PATH

TEXTS = [
    "a photo of a cat.",
    "A PHOTO OF A DOG!!!",
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "Wall St. Bears Claw Back Into the Black (Reuters)",
    "it 's a lovely film with lovely performances",
    "   leading and trailing   whitespace   ",
    "numbers 1234567890 mixed42tokens",
    "punctuation!@#$%^&*()_+-=[]{}|;':\",./<>?",
    "contractions don't can't we're i'll they've she'd i'm",
    "",
    "x",
    "supercalifragilisticexpialidocious",
    "ag news: oil prices soar to all-time record",
]


def _mutate(s: str, rng: random.Random) -> str:
    """Random single-character LEAF-style edit (insert/sub/delete)."""
    vocab = string.ascii_letters + " " + string.digits + string.punctuation
    if not s:
        return rng.choice(vocab)
    i = rng.randrange(len(s))
    op = rng.randrange(3)
    if op == 0:
        return s[:i] + rng.choice(vocab) + s[i:]
    if op == 1:
        return s[:i] + rng.choice(vocab) + s[i + 1:]
    return s[:i] + s[i + 1:]


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    """Build HF CLIPTokenizer offline from the same BPE asset."""
    transformers = pytest.importorskip("transformers")
    tok = CLIPTokenizer()
    d = tmp_path_factory.mktemp("hf_tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(tok.encoder, f)
    with gzip.open(DEFAULT_BPE_PATH, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(lines[1:48895]))
    return transformers.CLIPTokenizer(
        str(d / "vocab.json"), str(d / "merges.txt"))


def test_vocab_constants(tokenizer):
    assert tokenizer.vocab_size == 49408
    assert tokenizer.sot_token_id == 49406
    assert tokenizer.eot_token_id == 49407
    # canonical base-vocab ordering: printables first
    assert tokenizer.encoder["a"] == 64
    assert tokenizer.encoder["a</w>"] == 320
    assert tokenizer.encoder["!"] == 0


def test_known_openai_golden(tokenizer):
    """Non-circular golden: the canonical OpenAI CLIP tokenization of
    'a photo of a cat.' (ids from the released vocab)."""
    assert tokenizer.encode("a photo of a cat.") == [320, 1125, 539, 320,
                                                    2368, 269]


def test_parity_with_hf(tokenizer, hf_tokenizer):
    texts = list(TEXTS)
    rng = random.Random(0)
    for base in TEXTS:
        for _ in range(5):
            texts.append(_mutate(base, rng))
    for t in texts:
        ours = tokenizer.encode(t)
        theirs = hf_tokenizer(t)["input_ids"][1:-1]  # strip SOT/EOT
        assert ours == theirs, f"mismatch on {t!r}: {ours} vs {theirs}"


def test_fixed_shape_output(tokenizer):
    arr = tokenizer(TEXTS)
    assert arr.shape == (len(TEXTS), 77)
    assert arr.dtype == np.int32
    # every row starts with SOT and contains exactly one EOT
    assert (arr[:, 0] == tokenizer.sot_token_id).all()
    assert (arr == tokenizer.eot_token_id).sum(axis=-1).tolist() == [1] * len(TEXTS)


def test_truncation_keeps_eot(tokenizer):
    long = "word " * 200
    arr = tokenizer([long])
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tokenizer.sot_token_id
    assert arr[0, -1] == tokenizer.eot_token_id
    assert (arr[0] != 0).all()


def test_empty_string(tokenizer):
    arr = tokenizer([""])
    assert arr[0, 0] == tokenizer.sot_token_id
    assert arr[0, 1] == tokenizer.eot_token_id
    assert (arr[0, 2:] == 0).all()


def test_roundtrip_decode(tokenizer):
    ids = tokenizer.encode("a photo of a cat.")
    assert tokenizer.decode(ids).strip() == "a photo of a cat ."


def test_cache_consistency(tokenizer):
    fresh = CLIPTokenizer()
    for t in TEXTS:
        a = fresh.encode(t)
        b = fresh.encode(t)  # cached path
        assert a == b == tokenizer.encode(t)


def test_tokenize_arrays_lengths(tokenizer):
    toks, lengths = tokenizer.tokenize_arrays(["hi", "a photo of a cat"])
    assert lengths.tolist() == [(toks[i] != 0).sum() for i in range(2)]
    assert toks[0, lengths[0] - 1] == tokenizer.eot_token_id
