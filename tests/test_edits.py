"""Unit tests for the Levenshtein edit machinery (pure host functions).

Expectations hand-derived from the interleaved-slot encoding semantics
(reference `utils_attacks.py:169-295`): slots [_,c,_,a,_,t,_] for "cat",
even = insertion, odd = character positions.
"""
import numpy as np

from leaf_tpu.attacks import edits
from leaf_tpu.attacks.constraint import WordConstraint, word_tokenize

V = edits.DEFAULT_VOCAB


def lev(a: str, b: str) -> int:
    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[len(b)])


def idx(ch: str) -> int:
    return V.index(ord(ch))


def test_vocab_layout():
    assert V[0] == -1
    assert len(V) == 96
    assert chr(V[1]) == "a"
    assert " " in [chr(c) for c in V[1:]]


def test_num_slots():
    assert edits.num_slots(3, 1) == 7
    assert edits.num_slots(3, 2) == 11
    assert edits.num_slots(0, 1) == 1


def test_insert():
    assert edits.apply_edit("cat", 0, idx("x"), V) == "xcat"
    assert edits.apply_edit("cat", 2, idx(" "), V) == "c at"
    assert edits.apply_edit("cat", 6, idx("s"), V) == "cats"


def test_substitute():
    assert edits.apply_edit("cat", 1, idx("b"), V) == "bat"
    assert edits.apply_edit("cat", 3, idx("u"), V) == "cut"
    assert edits.apply_edit("cat", 5, idx("r"), V) == "car"


def test_delete():
    assert edits.apply_edit("cat", 1, 0, V) == "at"
    assert edits.apply_edit("cat", 3, 0, V) == "ct"
    # deleting an empty slot is a no-op
    assert edits.apply_edit("cat", 0, 0, V) == "cat"


def test_self_substitution_with_alternative_deletes():
    # substituting a char with itself + alternative=-1 → deletion
    assert edits.apply_edit("cat", 1, idx("c"), V, alternative=-1) == "at"
    # without alternative, it's a no-op substitution
    assert edits.apply_edit("cat", 1, idx("c"), V, alternative=None) == "cat"
    # with a non-delete alternative, the alternative char is written
    assert edits.apply_edit("cat", 1, idx("c"), V,
                            alternative=ord("z")) == "zat"


def test_space_probe_enumeration():
    out = edits.generate_all_sentences("ab", edits.SPACE_VOCAB, alternative=-1)
    assert out == [" ab", " b", "a b", "a ", "ab "]


def test_generate_all_sentences_count_and_distance():
    s = "hello"
    out = edits.generate_all_sentences(s, V, alternative=-1)
    assert len(out) == edits.num_slots(len(s)) * len(V)
    assert all(lev(s, o) <= 1 for o in out)


def test_generate_random_sentences_distance_k():
    rng = np.random.default_rng(0)
    for k in (1, 2, 3):
        out = edits.generate_random_sentences("a photo of a cat", V, 20, k=k,
                                              alternative=-1, rng=rng)
        assert len(out) == 20
        assert all(lev("a photo of a cat", o) <= k for o in out)


def test_random_at_z_fixed_position():
    rng = np.random.default_rng(1)
    out = edits.generate_random_sentences_at_z("dog", 1, V, 10,
                                               alternative=-1, rng=rng)
    # all edits at slot 1 (the 'd'): substitution or deletion of 'd'
    assert all(o[-2:] == "og" for o in out)
    assert all(lev("dog", o) <= 1 for o in out)


def test_sample_positions_no_replacement_when_possible():
    rng = np.random.default_rng(2)
    pos = edits.sample_positions(10, 15, rng=rng)  # 21 slots, 15 draws
    assert len(pos) == 15 and len(set(pos.tolist())) == 15
    pos = edits.sample_positions(2, 10, rng=rng)   # 5 slots, 10 draws
    assert len(pos) == 10


def test_word_tokenize():
    assert word_tokenize("don't stop, it's fine.") == [
        "don", "'t", "stop", ",", "it", "'s", "fine", "."]


def test_constraint_semantics():
    c = WordConstraint(words={"cat", "hat", "the"})
    # "the cat" has 2 dictionary words; edits must reduce the count
    assert c.valid("the cat", ["the cxt"]) == [True]    # cat destroyed
    assert c.valid("the cat", ["the hat"]) == [False]   # still 2 words
    assert c.valid("the cat", ["thx cxt"]) == [True]    # both destroyed
    out = c.filter("the cat", ["the hat", "the cxt"])
    assert out == ["the cat", "the cxt"]


def test_constraint_default_lexicon_loads():
    c = WordConstraint()
    assert c.count("a photo of a cat") >= 2
    assert c.count("xqzv bnmk") == 0
