"""Parity tests: native C++ BPE tokenizer vs the pure-Python reference
implementation, including attack-style mutated strings and a throughput
sanity check."""
import random
import string
import time

import numpy as np
import pytest

from leaf_tpu.tokenizer.bpe import CLIPTokenizer, DEFAULT_BPE_PATH
from leaf_tpu.tokenizer.native_binding import get_native

native = get_native(DEFAULT_BPE_PATH)
pytestmark = pytest.mark.skipif(native is None,
                                reason="native tokenizer unavailable")

TEXTS = [
    "a photo of a cat.",
    "A PHOTO OF A DOG!!!",
    "the quick brown fox jumps over the lazy dog",
    "Wall St. Bears Claw Back Into the Black (Reuters)",
    "it 's a lovely film with lovely performances",
    "numbers 1234567890 mixed42tokens",
    "punctuation!@#$%^*()_+-=[]{}|;':\",./<>?",
    "contractions don't can't we're i'll they've she'd i'm",
    "",
    "x",
    "supercalifragilisticexpialidocious",
    "   leading and trailing   whitespace   ",
    "apostrophe edge 'x 'll' ''s",
]


@pytest.fixture(scope="module")
def py_tok():
    t = CLIPTokenizer()
    t._native = None              # force pure-Python path
    t._native_checked = True
    return t


@pytest.fixture(scope="module")
def nat_tok():
    t = CLIPTokenizer()
    assert t._native is None      # lazy
    return t


def mutated_battery():
    rng = random.Random(0)
    vocab = string.ascii_letters + " " + string.digits + string.punctuation
    vocab = vocab.replace("&", "")
    out = []
    for base in TEXTS:
        for _ in range(10):
            s = base
            for _ in range(rng.randrange(1, 3)):
                if not s:
                    s = rng.choice(vocab)
                    continue
                i = rng.randrange(len(s))
                op = rng.randrange(3)
                if op == 0:
                    s = s[:i] + rng.choice(vocab) + s[i:]
                elif op == 1:
                    s = s[:i] + rng.choice(vocab) + s[i + 1:]
                else:
                    s = s[:i] + s[i + 1:]
            out.append(s)
    return out


def test_native_matches_python_battery(py_tok):
    texts = TEXTS + mutated_battery()
    ours = native.encode_batch(texts, 77)
    ref = py_tok(texts)
    for i, t in enumerate(texts):
        assert ours[i].tolist() == ref[i].tolist(), f"mismatch on {t!r}"


def test_tokenizer_dispatches_to_native(nat_tok, py_tok):
    texts = ["hello world", "a photo of a cat"]
    out = nat_tok(texts)
    assert nat_tok._native is not None
    np.testing.assert_array_equal(out, py_tok(texts))
    # non-ascii falls back to Python and still works
    out2 = nat_tok(["café au lait", "hello"])
    assert out2.shape == (2, 77)
    np.testing.assert_array_equal(out2, py_tok(["café au lait", "hello"]))


def test_native_truncation():
    long = "word " * 200
    out = native.encode_batch([long], 77)
    assert out[0, 0] == 49406
    assert out[0, -1] == 49407
    assert (out[0] != 0).all()


def test_native_faster_than_python(py_tok):
    texts = mutated_battery() * 20  # ~2600 strings, all distinct-ish
    t0 = time.perf_counter()
    native.encode_batch(texts, 77)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py_tok(texts)
    t_py = time.perf_counter() - t0
    # both benefit from caches warmed by earlier tests; native should
    # still win clearly on the whole batch
    assert t_native < t_py, (t_native, t_py)


def test_encode_edits_matches_python(py_tok):
    from leaf_tpu.attacks import edits
    rng = np.random.default_rng(0)
    sentences = ["a photo of a cat", "wall street stocks fall!", "x", "hi"]
    vocab = np.asarray(edits.DEFAULT_VOCAB, np.int32)
    B, rho = len(sentences), 12
    zs = np.stack([
        np.asarray(edits.sample_positions(len(s), rho, rng=rng))
        for s in sentences]).astype(np.int32)
    us = rng.integers(0, len(vocab), size=(B, rho))
    cps = vocab[us]
    out = native.encode_edits(sentences, zs, cps, 77).reshape(B, rho, 77)
    for i, s in enumerate(sentences):
        for j in range(rho):
            expect = edits.apply_edit(s, int(zs[i, j]), int(us[i, j]),
                                      edits.DEFAULT_VOCAB, alternative=-1)
            ref = py_tok([expect])[0]
            assert out[i, j].tolist() == ref.tolist(), (
                s, int(zs[i, j]), int(us[i, j]), expect)


def test_encode_edits_exhaustive_slot_vocab(py_tok):
    """Every slot x a vocab probe set that includes the '_' slot
    placeholder (inserting '_' is a SELF-SUBSTITUTION no-op under
    alternative=-1 — a native fast path used to insert it literally),
    deletion (-1), and a self-sub char."""
    from leaf_tpu.attacks import edits
    s = "a photo of a cat"
    probe = [ord("_"), ord("a"), ord(" "), -1, ord("x")]
    zs, cps = [], []
    for z in range(2 * len(s) + 1):
        for cp in probe:
            zs.append(z)
            cps.append(cp)
    zs = np.asarray(zs, np.int32)[None]
    cps = np.asarray(cps, np.int32)[None]
    out = native.encode_edits([s], zs, cps, 77).reshape(1, -1, 77)
    for i, (z, cp) in enumerate(zip(zs[0], cps[0])):
        expect = edits.apply_edit(s, int(z), 0, [int(cp)], alternative=-1)
        ref = py_tok([expect])[0]
        assert out[0, i].tolist() == ref.tolist(), (int(z), int(cp), expect)


def test_wc_valid_edits_placeholder_insert_is_noop():
    """'_'-insertion (a no-op edit) must be judged on the UNCHANGED
    sentence by the C++ constraint mask, same as WordConstraint on the
    python path."""
    from leaf_tpu.attacks.constraint import WordConstraint
    wc = WordConstraint()
    s = "wall street stocks fall"
    zs = np.asarray([[0, 4]], np.int32)
    us = np.asarray([[ord("_"), ord("_")]], np.int32)
    mask = wc.valid_edits_batch([s], zs, us)
    # a no-op edit never strictly decreases the word count → invalid
    assert mask.tolist() == [[False, False]]


def test_encode_edits_space_probes(py_tok):
    from leaf_tpu.attacks import edits
    rng = np.random.default_rng(1)
    sentences = ["hello world", "a  b", "trailing "]
    B, rho = len(sentences), 8
    zs = np.stack([
        np.asarray(edits.sample_positions(len(s), rho, rng=rng))
        for s in sentences]).astype(np.int32)
    cps = np.full((B, rho), ord(" "), np.int32)
    out = native.encode_edits(sentences, zs, cps, 77).reshape(B, rho, 77)
    for i, s in enumerate(sentences):
        for j in range(rho):
            expect = edits.apply_edit(s, int(zs[i, j]), 0, edits.SPACE_VOCAB,
                                      alternative=-1)
            ref = py_tok([expect])[0]
            assert out[i, j].tolist() == ref.tolist(), (s, int(zs[i, j]))
