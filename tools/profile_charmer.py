"""Speed-of-light accounting for the batched Charmer path (VERDICT r4
weak #6 / next #7).

The reference's eval suite runs Charmer strictly per-sentence
(`/root/reference/utils_attacks.py:451-580`, "THIS ATTACK CAN ONLY
ATTACK 1 SENTENCE AT A TIME"); `attack_text_charmer_batched` shares
device batches across sentences.  This tool measures WHERE the batched
milliseconds go — host edit generation, tokenise+pad, phase-1 probe
scoring, phase-2 candidate scoring — against the sequential variant at
the eval config (n=20, k=1, ViT-L), and prints one JSON line.

Usage:  python tools/profile_charmer.py [--model ViT-L-14-quickgelu]
        [--batch 16] [--words 10] [--n 20] [--k 1] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser("charmer speed-of-light profiler")
    p.add_argument("--model", default="ViT-L-14-quickgelu")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--words", type=int, default=10,
                   help="caption length in words (AG-News sentences are "
                        "longer; sweep this for the length ladder)")
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--precision", default="bf16")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from leaf_tpu.attacks import edits
    from leaf_tpu.attacks.engine import CandidateScorer
    from leaf_tpu.attacks.text import (
        _normalize_np,
        _pad_rows,
        attack_text_charmer_batched,
        attack_text_charmer_inference,
    )
    from leaf_tpu.models import create_model, get_tokenizer
    from leaf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = create_model(args.model, precision=args.precision)
    tokenizer = get_tokenizer(args.model)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    scorer = CandidateScorer(model.cfg, dtype=dtype)
    text_params = model.params["text"]

    rng = np.random.default_rng(0)
    words = ("market stocks rally government policy team cup season "
             "tech chip quarterly earnings ancient fossil researchers "
             "film festival review study climate report city council "
             "launch satellite orbit trade deal talks").split()
    sentences = [" ".join(rng.choice(words, size=args.words))
                 for _ in range(args.batch)]
    L = int(np.mean([len(s) for s in sentences]))

    # anchors: clean-sentence features of the same (frozen) tower — the
    # textfare eval objective
    clean = tokenizer(sentences)
    anchors = _normalize_np(np.asarray(
        scorer.encode_text(text_params, clean)))

    def sync(x):
        np.asarray(x)

    # ---- end-to-end: sequential vs batched --------------------------
    for warm in range(2):  # compile both paths
        attack_text_charmer_inference(scorer, text_params, tokenizer,
                                      sentences[0], anchors[0], "sim",
                                      n=args.n, k=args.k)
        attack_text_charmer_batched(scorer, text_params, tokenizer,
                                    sentences, anchors, "sim",
                                    n=args.n, k=args.k)

    seq_ms = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for i, s in enumerate(sentences):
            attack_text_charmer_inference(scorer, text_params, tokenizer,
                                          s, anchors[i], "sim",
                                          n=args.n, k=args.k)
        seq_ms.append((time.perf_counter() - t0) * 1e3 / args.batch)
    bat_ms = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        attack_text_charmer_batched(scorer, text_params, tokenizer,
                                    sentences, anchors, "sim",
                                    n=args.n, k=args.k)
        bat_ms.append((time.perf_counter() - t0) * 1e3 / args.batch)

    # ---- phase ladder for the batched path (k=1 inner round) --------
    ph = {}

    def timeit(key, fn):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append((time.perf_counter() - t0) * 1e3 / args.batch)
        ph[key] = round(float(np.median(ts)), 2)
        return out

    probe_rows = timeit("host_probe_gen_ms", lambda: [
        edits.generate_all_sentences(S, edits.SPACE_VOCAB, alternative=-1)
        for S in sentences])
    tokens, mask = timeit("probe_tokenize_pad_ms",
                          lambda: _pad_rows(tokenizer, sentences, probe_rows))
    n_probes = tokens.shape[1]

    def p1():
        _, _, loss = scorer.score_rows(text_params, tokens, anchors, "sim",
                                       mask=mask)
        sync(loss)
        return loss

    loss = timeit("phase1_score_ms", p1)
    top = np.argsort(-np.asarray(loss), axis=1, kind="stable")[:, :args.n]

    cand_rows = timeit("host_cand_gen_ms", lambda: [
        edits.generate_all_sentences(
            S, edits.DEFAULT_VOCAB,
            subset_z=top[i][:min(args.n, len(probe_rows[i]))].tolist(),
            alternative=-1)
        for i, S in enumerate(sentences)])
    ctokens, cmask = timeit("cand_tokenize_pad_ms",
                            lambda: _pad_rows(tokenizer, sentences, cand_rows))
    n_cands = ctokens.shape[1]

    def p2():
        best, _, closs = scorer.score_rows(text_params, ctokens, anchors,
                                           "sim", mask=cmask)
        sync(closs)
        return best

    timeit("phase2_score_ms", p2)

    # ---- fused-path phase ladder (the default batched path when the
    # C++ tokenizer is available: no candidate strings materialised) --
    from leaf_tpu.attacks.text import _native_of
    fph = {}
    native = _native_of(tokenizer)
    if native is not None:
        ctx = getattr(tokenizer, "context_length", 77)
        B = len(sentences)
        n_slots = [edits.num_slots(len(S)) for S in sentences]
        P = max(n_slots)

        def fused_p1_prep():
            zs = np.zeros((B, P), np.int32)
            cps = np.full((B, P), -1, np.int32)
            pm = np.zeros((B, P), bool)
            for i, m in enumerate(n_slots):
                zs[i, :m] = np.arange(m)
                cps[i, :m] = ord(" ")
                pm[i, :m] = True
            return native.encode_edits(sentences, zs, cps, ctx
                                       ).reshape(B, P, ctx), pm

        def timeitf(key, fn):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out_ = fn()
                ts.append((time.perf_counter() - t0) * 1e3 / args.batch)
            fph[key] = round(float(np.median(ts)), 2)
            return out_

        ftokens, fpm = timeitf("p1_grid_encode_ms", fused_p1_prep)

        def fp1():
            _, _, l_ = scorer.score_rows(text_params, ftokens, anchors,
                                         "sim", mask=fpm)
            sync(l_)
            return l_
        floss = timeitf("p1_score_ms", fp1)
        ftop = np.argsort(-np.asarray(floss), axis=1,
                          kind="stable")[:, :args.n]
        vcodes = np.asarray(edits.DEFAULT_VOCAB, np.int32)
        nv = len(vcodes)

        def fused_p2_prep():
            R = args.n * nv
            zs2 = np.zeros((B, R), np.int32)
            cps2 = np.full((B, R), -1, np.int32)
            cm = np.zeros((B, R), bool)
            for i, m in enumerate(n_slots):
                vn = min(args.n, m)
                zs2[i, :vn * nv] = np.repeat(ftop[i, :vn], nv)
                cps2[i, :vn * nv] = np.tile(vcodes, vn)
                cm[i, :vn * nv] = True
            return native.encode_edits(sentences, zs2, cps2, ctx
                                       ).reshape(B, R, ctx), cm

        ftokens2, fcm = timeitf("p2_grid_encode_ms", fused_p2_prep)

        def fp2():
            b, _, l_ = scorer.score_rows(text_params, ftokens2, anchors,
                                         "sim", mask=fcm)
            sync(l_)
            return b
        timeitf("p2_score_ms", fp2)

    out = {
        "model": args.model, "batch": args.batch, "n": args.n, "k": args.k,
        "mean_chars": L, "probes_per_sentence": int(n_probes),
        "cands_per_sentence": int(n_cands),
        "sequential_ms_per_sentence": round(float(np.median(seq_ms)), 1),
        "batched_ms_per_sentence": round(float(np.median(bat_ms)), 1),
        "speedup": round(float(np.median(seq_ms) / np.median(bat_ms)), 2),
        "phases_string_path": ph,
        "phase_sum_ms": round(sum(ph.values()), 1),
        "phases_fused_path": fph,
        "fused_phase_sum_ms": round(sum(fph.values()), 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
