"""Character-level (Levenshtein-k) text attacks.

TPU-native re-expression of the reference attack library
(`/root/reference/utils_attacks.py:297-643,732-819`).  The search
structure (probe positions with space-substitution, then try characters
at the best positions) is preserved exactly; the *execution* is
restructured so each round is host string-edit + one fixed-shape device
scoring call (see `engine.CandidateScorer`).

One behavioural deviation, on purpose: the reference's manual batch
chunking silently drops the final candidate of each chunk
(`utils_attacks.py:424,485` — `end = min(..., len(SS)-1)`); here every
candidate is scored.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from leaf_tpu.attacks import edits
from leaf_tpu.attacks.constraint import WordConstraint
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.models import clip as lclip


def _normalize_np(a):
    import jax.numpy as jnp
    return lclip.l2_normalize(jnp.asarray(a))


def _native_of(tokenizer):
    """Native fused edit+tokenize handle, if the tokenizer has one."""
    native = getattr(tokenizer, "_native", None)
    if native is None and not getattr(tokenizer, "_native_checked", True):
        tokenizer([""])  # trigger lazy native init (once: sets _checked)
        native = tokenizer._native
    return native


def _pad_rows(tokenizer, sentences, rows):
    """Ragged per-sentence candidate rows → ([B, n_max, C] tokens,
    [B, n_max] valid mask); short rows pad with the clean sentence."""
    n_max = max(len(r) for r in rows)
    mask = np.zeros((len(rows), n_max), bool)
    flat = []
    for i, row in enumerate(rows):
        mask[i, :len(row)] = True
        flat.extend(row + [sentences[i]] * (n_max - len(row)))
    return tokenizer(flat).reshape(len(rows), n_max, -1), mask


def _fused_ok(native, constraint, sentences, vocab) -> bool:
    """The C++ fused edit+tokenize path applies when unconstrained,
    native is built, every sentence is printable ASCII (same guard as
    `_edit_tokens_fast`), and every vocab codepoint is single-byte
    ASCII (the native ApplyEdit writes one char per edit; a bare
    inserted '&' is fine — html-unescape only rewrites full entity
    sequences, which the ASCII-'&'-free sentence guard covers)."""
    return (constraint is None and native is not None
            and all(s.isascii() and "&" not in s for s in sentences)
            and all(c == -1 or 0 < c < 128 for c in vocab))


def _constrain_grid(constraint, sentences, tokens, grid_mask, zs, cps,
                    native, ctx):
    """Apply the word-validity constraint to a fused (z, cp) grid the
    way the string path's `filter_batched` does — invalid candidates
    are REPLACED by the clean sentence (they score as the original, not
    -inf), preserving index↔slot correspondence.  Returns the validity
    array so the caller can freeze the winner when an invalid (== the
    original) candidate wins."""
    if constraint is None:
        return None
    valid = np.asarray(
        constraint.valid_edits_batch(sentences, zs, cps, alternative=-1),
        bool)
    clean = native.encode_batch(list(sentences), ctx)
    repl = ~valid & grid_mask
    if repl.any():
        i_idx, j_idx = np.nonzero(repl)
        tokens[i_idx, j_idx] = clean[i_idx]
    return valid


def _fused_probe_grid(native, sentences, ctx):
    """Space probes at every slot, as (z, cp) grids through the fused
    tokenizer: returns (tokens [B, P, ctx], mask [B, P], n_slots,
    zs, cps).  Probe index == slot index (slot-ordered), matching the
    string path's `generate_all_sentences(S, SPACE_VOCAB)` ordering."""
    B = len(sentences)
    n_slots = [edits.num_slots(len(S)) for S in sentences]
    P = max(n_slots)
    zs = np.zeros((B, P), np.int32)
    cps = np.full((B, P), -1, np.int32)  # pad = no-op delete@slot0
    mask = np.zeros((B, P), bool)
    for i, m in enumerate(n_slots):
        zs[i, :m] = np.arange(m)
        cps[i, :m] = ord(" ")
        mask[i, :m] = True
    tokens = native.encode_edits(sentences, zs, cps, ctx).reshape(B, P, ctx)
    return tokens, mask, n_slots, zs, cps


def _fused_cand_grid(native, sentences, top, n, vocab, n_slots, ctx):
    """Full-vocab candidates at the top-n slots: returns (tokens
    [B, n·|V|, ctx], mask, zs, cps).  Candidate order is position-major
    then vocab, matching `generate_all_sentences(S, vocab,
    subset_z=top)`; the winner b decodes as (z=zs[i, b], u=b % |V|)."""
    B = len(sentences)
    vcodes = np.asarray(vocab, np.int32)
    nv = len(vcodes)
    R = n * nv
    zs = np.zeros((B, R), np.int32)
    cps = np.full((B, R), -1, np.int32)
    mask = np.zeros((B, R), bool)
    for i, m in enumerate(n_slots):
        vn = min(n, m)
        zs[i, :vn * nv] = np.repeat(top[i, :vn], nv)
        cps[i, :vn * nv] = np.tile(vcodes, vn)
        mask[i, :vn * nv] = True
    tokens = native.encode_edits(sentences, zs, cps, ctx).reshape(B, R, ctx)
    return tokens, mask, zs, cps


def _edit_tokens_fast(tokenizer, sentences, zs: np.ndarray, cps: np.ndarray):
    """[B] sentences + [B, rho] (slot, codepoint) edits → [B, rho, C]
    tokens via the C++ fused path, or None when unavailable."""
    native = _native_of(tokenizer)
    if native is None:
        return None
    if not all(s.isascii() and "&" not in s for s in sentences):
        return None
    ctx = getattr(tokenizer, "context_length", 77)
    B, rho = zs.shape
    return native.encode_edits(list(sentences), zs, cps, ctx).reshape(
        B, rho, ctx)


def attack_text_leaf(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentences: Sequence[str],
    anchor_features,
    objective: str = "l2",
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
    constraint: Optional[WordConstraint] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, List[str]]:
    """LEAF training attack — batch-parallel over sentences
    (reference `utils_attacks.py:297-393`).

    Per round: (1) probe ρ=n random slots per sentence with a space
    substitution, scored in one [B, n] device call, keep the best slot;
    (2) try ρ random vocabulary characters at that slot, scored in a
    second [B, n] call, keep the argmax-loss sentence.

    Returns (adversarial features [B, D], adversarial sentences).
    """
    rng = rng or np.random.default_rng()
    sentences = list(sentences)
    B = len(sentences)
    if objective in ("sim", "dissim"):
        anchor_features = _normalize_np(anchor_features)

    # Fast path (unconstrained): the C++ tokenizer applies each
    # (slot, char) edit and tokenizes in one pass, so candidate strings
    # are never materialised — only the B winners are reconstructed.
    # Single-byte-ASCII vocab only (native ApplyEdit writes one char;
    # a bare inserted '&' is fine — html-unescape only rewrites full
    # entity sequences, which the ASCII-sentence guard already covers).
    fast_ok = constraint is None and all(
        c == -1 or 0 < c < 128 for c in vocab)

    best_feats = None
    for _ in range(k):
        # ---- phase 1: find the most vulnerable position per sentence
        positions = np.stack([edits.sample_positions(len(S), n, rng=rng)
                              for S in sentences])
        tokens = None
        if fast_ok:
            space = np.full((B, n), ord(" "), np.int32)
            tokens = _edit_tokens_fast(tokenizer, sentences, positions, space)
        if tokens is None:
            probe_rows = [
                [edits.apply_edit(S, int(z), 0, edits.SPACE_VOCAB,
                                  alternative=-1)
                 for z in positions[i]]
                for i, S in enumerate(sentences)
            ]
            if constraint is not None:
                probe_rows = constraint.filter_batched(sentences, probe_rows)
            flat = [s for row in probe_rows for s in row]
            tokens = tokenizer(flat).reshape(B, n, -1)
        best_idx, _, _ = scorer.score_rows(
            text_params, tokens, anchor_features, objective)
        best_pos = [int(positions[i][best_idx[i]]) for i in range(B)]

        # ---- phase 2: try random characters at the winning position
        us = np.stack([rng.choice(len(vocab), size=n,
                                  replace=(n > len(vocab)))
                       for _ in range(B)])
        vocab_arr = np.asarray(vocab, np.int32)
        tokens = None
        if fast_ok:
            zs = np.repeat(np.asarray(best_pos, np.int32)[:, None], n, axis=1)
            tokens = _edit_tokens_fast(tokenizer, sentences, zs,
                                       vocab_arr[us])
        if tokens is None:
            cand_rows = [
                [edits.apply_edit(S, best_pos[i], int(u), vocab,
                                  alternative=-1) for u in us[i]]
                for i, S in enumerate(sentences)
            ]
            if constraint is not None:
                cand_rows = constraint.filter_batched(sentences, cand_rows)
            flat = [s for row in cand_rows for s in row]
            tokens = tokenizer(flat).reshape(B, n, -1)
        else:
            cand_rows = None
        best_idx, best_feats, _ = scorer.score_rows(
            text_params, tokens, anchor_features, objective)
        if cand_rows is None:
            sentences = [edits.apply_edit(S, best_pos[i],
                                          int(us[i][best_idx[i]]), vocab,
                                          alternative=-1)
                         for i, S in enumerate(sentences)]
        else:
            sentences = [cand_rows[i][best_idx[i]] for i in range(B)]

    return np.asarray(best_feats), sentences


def attack_text_bruteforce(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentence: str,
    anchor_features,
    objective: str = "l2",
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
    constraint: Optional[WordConstraint] = None,
) -> Tuple[str, int]:
    """Exhaustive k=1 attack: score every ((k+1)L+k)·|V| single edit
    (reference `utils_attacks.py:395-449`).  ASCII sentences run
    through the C++ fused edit+tokenize grid (+ native word-validity
    masks when constrained) like the batched charmer; decision parity
    with the string path is pinned by
    `test_bruteforce_fused_matches_string_path`."""
    if objective in ("sim", "dissim"):
        anchor_features = _normalize_np(anchor_features)

    native = _native_of(tokenizer)
    if _fused_ok(native, None, [sentence], vocab) and (
            constraint is None or constraint._get_native() is not None):
        ctx = getattr(tokenizer, "context_length", 77)
        nv = len(vocab)
        m = edits.num_slots(len(sentence))
        zs = np.repeat(np.arange(m, dtype=np.int32), nv)[None]
        cps = np.tile(np.asarray(vocab, np.int32), m)[None]
        tokens = native.encode_edits([sentence], zs, cps, ctx)
        valid = _constrain_grid(constraint, [sentence],
                                tokens.reshape(1, m * nv, ctx),
                                np.ones((1, m * nv), bool), zs, cps,
                                native, ctx)
        loss = scorer.score_flat(text_params, tokens, anchor_features,
                                 objective)
        b = int(np.argmax(loss))
        if valid is not None and not valid[0, b]:
            return sentence, 1  # invalid winner == the original
        return edits.apply_edit(sentence, int(zs[0, b]), b % nv,
                                vocab, 1, -1), 1

    candidates = edits.generate_all_sentences(sentence, vocab, alternative=-1)
    if constraint is not None:
        candidates = constraint.filter(sentence, candidates)
    tokens = tokenizer(candidates)
    loss = scorer.score_flat(text_params, tokens, anchor_features, objective)
    return candidates[int(np.argmax(loss))], 1


def attack_text_charmer_inference(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentence: str,
    anchor_features,
    objective: str = "l2",
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
    constraint: Optional[WordConstraint] = None,
    text_params2=None,
    anchor_features2=None,
    scorer2: Optional[CandidateScorer] = None,
) -> Tuple[str, int]:
    """Charmer attack (arXiv:2405.04346), single sentence
    (reference `utils_attacks.py:451-580`).

    Per round: score ALL (k=1 slot count) space substitutions, take the
    top-n positions, then try the full vocabulary at those positions.
    Optional second encoder (SDXL dual-tower mode): losses averaged.
    """
    if objective in ("sim", "dissim"):
        anchor_features = _normalize_np(anchor_features)
        if anchor_features2 is not None:
            anchor_features2 = _normalize_np(anchor_features2)

    dist = 0
    for dist in range(k):
        probes = edits.generate_all_sentences(
            sentence, edits.SPACE_VOCAB, alternative=-1)
        if constraint is not None:
            probes = constraint.filter(sentence, probes)
        loss = scorer.score_flat(text_params, tokenizer(probes),
                                 anchor_features, objective,
                                 anchor2=anchor_features2,
                                 text_params2=text_params2,
                                 scorer2=scorer2)
        top = np.argsort(-loss, kind="stable")[:min(n, len(loss))]

        candidates = edits.generate_all_sentences(
            sentence, vocab, subset_z=top.tolist(), alternative=-1)
        if constraint is not None:
            candidates = constraint.filter(sentence, candidates)
            if not candidates:
                candidates = [sentence]
        loss = scorer.score_flat(text_params, tokenizer(candidates),
                                 anchor_features, objective,
                                 anchor2=anchor_features2,
                                 text_params2=text_params2,
                                 scorer2=scorer2)
        sentence = candidates[int(np.argmax(loss))]
    return sentence, dist + 1


def attack_text_charmer_batched(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentences: Sequence[str],
    anchor_features,
    objective: str = "l2",
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
    constraint: Optional[WordConstraint] = None,
) -> List[str]:
    """Charmer over a BATCH of sentences — a TPU-native throughput
    extension: the reference attack is strictly per-sentence
    (`utils_attacks.py:455` "THIS ATTACK CAN ONLY ATTACK 1 SENTENCE AT
    A TIME"), leaving the device idle between sentences during eval.
    Each sentence's search here is *identical* to the sequential
    attack (independent searches, padded to a common candidate count
    and masked); they just share device batches.

    Returns the adversarial sentences (distance bookkeeping as in the
    sequential variant is per-round uniform: all sentences run k
    rounds).

    Unconstrained + ASCII + native tokenizer available, the whole
    search runs through the C++ fused edit+tokenize path
    (`bpe_encode_edits`): no candidate strings are ever materialised —
    only the winning edit is applied on host.  Profiling
    (tools/profile_charmer.py) showed host candidate generation +
    tokenisation was 57% of the batched milliseconds; the fused path
    removes it.  Decisions are identical to the string path (same
    position-major × vocab candidate order, same masks), pinned by
    `test_charmer_batched_fused_matches_string_path`."""
    sentences = list(sentences)
    B = len(sentences)
    if objective in ("sim", "dissim"):
        anchor_features = _normalize_np(anchor_features)
    anchors = np.asarray(anchor_features)

    native = _native_of(tokenizer)
    # constrained batches stay fused only when the word-validity masks
    # are ALSO native (the Python validity fallback would recount words
    # per candidate, slower than the string path it replaces)
    if _fused_ok(native, None, sentences, vocab) and (
            constraint is None or constraint._get_native() is not None):
        ctx = getattr(tokenizer, "context_length", 77)
        nv = len(vocab)
        for _ in range(k):
            tokens, pmask, n_slots, zs, cps = _fused_probe_grid(
                native, sentences, ctx)
            _constrain_grid(constraint, sentences, tokens, pmask, zs,
                            cps, native, ctx)
            _, _, loss = scorer.score_rows(text_params, tokens, anchors,
                                           objective, mask=pmask)
            top = np.argsort(-np.asarray(loss), axis=1,
                             kind="stable")[:, :n]
            tokens, cmask, zs2, cps2 = _fused_cand_grid(
                native, sentences, top, n, vocab, n_slots, ctx)
            cvalid = _constrain_grid(constraint, sentences, tokens, cmask,
                                     zs2, cps2, native, ctx)
            best_idx, _, _ = scorer.score_rows(text_params, tokens,
                                               anchors, objective,
                                               mask=cmask)
            # materialise only the winners; an invalid winner IS the
            # original sentence (the string path's in-place replacement)
            sentences = [
                sentences[i] if cvalid is not None and not cvalid[i, b]
                else edits.apply_edit(sentences[i], int(zs2[i, b]),
                                      int(b) % nv, vocab, 1, -1)
                for i, b in enumerate(best_idx)]
        return sentences

    for _ in range(k):
        # ---- phase 1: ALL space substitutions, padded across sentences
        probe_rows = [edits.generate_all_sentences(S, edits.SPACE_VOCAB,
                                                   alternative=-1)
                      for S in sentences]
        if constraint is not None:
            probe_rows = constraint.filter_batched(sentences, probe_rows)
        tokens, mask = _pad_rows(tokenizer, sentences, probe_rows)
        _, _, loss = scorer.score_rows(text_params, tokens, anchors,
                                       objective, mask=mask)
        loss = np.asarray(loss)
        top = np.argsort(-loss, axis=1, kind="stable")[:, :n]  # [B, n] slot indices

        # ---- phase 2: full vocabulary at the top-n positions
        cand_rows = [
            edits.generate_all_sentences(S, vocab,
                                         subset_z=top[i][:min(
                                             n, len(probe_rows[i]))].tolist(),
                                         alternative=-1)
            for i, S in enumerate(sentences)
        ]
        if constraint is not None:
            cand_rows = [c if c else [s] for c, s in
                         zip(constraint.filter_batched(sentences, cand_rows),
                             sentences)]
        tokens, mask = _pad_rows(tokenizer, sentences, cand_rows)
        best_idx, _, _ = scorer.score_rows(text_params, tokens, anchors,
                                           objective, mask=mask)
        sentences = [cand_rows[i][best_idx[i]] for i in range(B)]
    return sentences


def attack_text_charmer_classification(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentence: str,
    class_features,
    label: int,
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
) -> Tuple[str, int]:
    """Charmer with margin loss over class-anchor similarities;
    early-exits once the prediction flips
    (reference `utils_attacks.py:582-643`)."""
    class_features = _normalize_np(class_features)
    dist = 0
    for dist in range(k):
        probes = edits.generate_all_sentences(
            sentence, edits.SPACE_VOCAB, alternative=-1)
        loss, _ = scorer.score_classification(
            text_params, tokenizer(probes), class_features, label)
        top = np.argsort(-loss, kind="stable")[:min(n, len(loss))]

        candidates = edits.generate_all_sentences(
            sentence, vocab, subset_z=top.tolist(), alternative=-1)
        loss, preds = scorer.score_classification(
            text_params, tokenizer(candidates), class_features, label)
        best = int(np.argmax(loss))
        sentence = candidates[best]
        if preds[best] != label:
            break
    return sentence, dist + 1


def attack_text_charmer_classification_batched(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentences: Sequence[str],
    class_features,
    labels: Sequence[int],
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
) -> List[str]:
    """Batched Charmer classification attack: per-sentence searches are
    identical to `attack_text_charmer_classification` (including the
    early exit — a sentence whose prediction has flipped is frozen for
    the remaining rounds), but probes/candidates share device batches.
    Unconstrained ASCII batches run through the C++ fused edit+tokenize
    grids (`_fused_probe_grid`/`_fused_cand_grid`) — no candidate
    strings materialised; decisions pinned identical by
    `test_charmer_classification_batched_fused_matches_string_path`.
    """
    sentences = list(sentences)
    B = len(sentences)
    class_features = _normalize_np(class_features)
    labels = np.asarray(labels)
    done = np.zeros(B, bool)

    native = _native_of(tokenizer)
    if _fused_ok(native, None, sentences, vocab):
        ctx = getattr(tokenizer, "context_length", 77)
        nv = len(vocab)
        for _ in range(k):
            if done.all():
                break
            tokens, pmask, n_slots, _, _ = _fused_probe_grid(
                native, sentences, ctx)
            loss, _ = scorer.score_classification_rows(
                text_params, tokens, class_features, labels, pmask)
            top = np.argsort(-loss, axis=1, kind="stable")
            tokens, cmask, zs2, _ = _fused_cand_grid(
                native, sentences, top, n, vocab, n_slots, ctx)
            loss, preds = scorer.score_classification_rows(
                text_params, tokens, class_features, labels, cmask)
            best = np.argmax(loss, axis=1)
            for i in range(B):
                if done[i]:
                    continue      # frozen after an earlier flip
                b = int(best[i])
                sentences[i] = edits.apply_edit(
                    sentences[i], int(zs2[i, b]), b % nv, vocab, 1, -1)
                if preds[i, b] != labels[i]:
                    done[i] = True
        return sentences

    def pad_rows(rows):
        return _pad_rows(tokenizer, sentences, rows)

    for _ in range(k):
        if done.all():
            break
        # ---- phase 1: margin loss over ALL space probes, padded
        probe_rows = [edits.generate_all_sentences(S, edits.SPACE_VOCAB,
                                                   alternative=-1)
                      for S in sentences]
        tokens, mask = pad_rows(probe_rows)
        loss, _ = scorer.score_classification_rows(
            text_params, tokens, class_features, labels, mask)
        top = np.argsort(-loss, axis=1, kind="stable")

        # ---- phase 2: full vocabulary at the top-n positions
        cand_rows = [
            edits.generate_all_sentences(
                S, vocab,
                subset_z=top[i][:min(n, len(probe_rows[i]))].tolist(),
                alternative=-1)
            for i, S in enumerate(sentences)
        ]
        tokens, mask = pad_rows(cand_rows)
        loss, preds = scorer.score_classification_rows(
            text_params, tokens, class_features, labels, mask)
        best = np.argmax(loss, axis=1)
        for i in range(B):
            if done[i]:
                continue          # frozen after an earlier flip
            sentences[i] = cand_rows[i][best[i]]
            if preds[i, best[i]] != labels[i]:
                done[i] = True
    return sentences


def attack_text_charmer_constrained_ret(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    sentence: str,
    anchor_features=None,
    objective: str = "l2",
    n: int = 10,
    k: int = 1,
    vocab: Sequence[int] = edits.DEFAULT_VOCAB,
    constraint: Optional[WordConstraint] = None,
) -> Tuple[str, int]:
    """Targeted/untargeted retrieval attack variant
    (reference `utils_attacks.py:732-819`).

    With `anchor_features` set: pull toward the (harmful) target
    caption.  With anchor None: repel from the sentence's own original
    embedding (negl2 on the original features).
    """
    import jax.numpy as jnp
    if anchor_features is None:
        orig = scorer.encode_text(text_params, tokenizer([sentence]))[0]
        anchor, obj = orig, {"l2": "negl2", "dissim": "sim"}[objective]
    else:
        anchor = jnp.asarray(anchor_features)
        obj = objective
    if obj in ("sim", "dissim"):
        anchor = _normalize_np(anchor)

    # the reference scores PHASE 1 (position probes) on normalized
    # candidate features even for l2 (`utils_attacks.py:760`
    # normalize=True) while phase 2 uses raw features (`:795`
    # normalize=False) — an upstream inconsistency reproduced verbatim
    p1_obj = obj + "_normfeat" if obj in ("l2", "negl2") else obj

    dist = 0
    for dist in range(k):
        probes = edits.generate_all_sentences(
            sentence, edits.SPACE_VOCAB, alternative=-1)
        if constraint is not None:
            probes = constraint.filter(sentence, probes)
        loss = scorer.score_flat(text_params, tokenizer(probes), anchor,
                                 p1_obj)
        top = np.argsort(-loss, kind="stable")[:min(n, len(loss))]

        candidates = edits.generate_all_sentences(
            sentence, vocab, subset_z=top.tolist(), alternative=-1)
        if constraint is not None:
            candidates = constraint.filter(sentence, candidates)
            if not candidates:
                candidates = [sentence]
        loss = scorer.score_flat(text_params, tokenizer(candidates), anchor, obj)
        sentence = candidates[int(np.argmax(loss))]
    return sentence, dist + 1
