"""Captioning benchmark (CoCa generation + BLEU-4 / CIDEr-D).

Re-expression of `src/clip_benchmark/metrics/captioning.py`: generate
a caption per image with a CoCa model, score against the reference
captions.  The reference delegates scoring to pycocoevalcap; here
BLEU-4 (with brevity penalty, corpus-level) and CIDEr-D are
implemented directly on token n-grams — same formulas, no Java
dependency.
"""
from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

import numpy as np

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def _tok(s: str) -> List[str]:
    return _WORD_RE.findall(s.lower())


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu4(candidates: Sequence[str], references: Sequence[Sequence[str]]
          ) -> float:
    """Corpus BLEU-4 with uniform weights and brevity penalty."""
    log_precisions = []
    cand_toks = [_tok(c) for c in candidates]
    ref_toks = [[_tok(r) for r in refs] for refs in references]
    for n in range(1, 5):
        match, total = 0, 0
        for cand, refs in zip(cand_toks, ref_toks):
            cg = _ngrams(cand, n)
            max_ref: Counter = Counter()
            for r in refs:
                rg = _ngrams(r, n)
                for g, c in rg.items():
                    max_ref[g] = max(max_ref[g], c)
            match += sum(min(c, max_ref[g]) for g, c in cg.items())
            total += max(sum(cg.values()), 0)
        if total == 0 or match == 0:
            return 0.0
        log_precisions.append(math.log(match / total))
    c_len = sum(len(c) for c in cand_toks)
    r_len = sum(min((abs(len(r) - len(c)), len(r))
                    for r in refs)[1]
                for c, refs in zip(cand_toks, ref_toks))
    bp = 1.0 if c_len > r_len else math.exp(1 - r_len / max(c_len, 1))
    return bp * math.exp(sum(log_precisions) / 4)


def cider_d(candidates: Sequence[str], references: Sequence[Sequence[str]],
            n_max: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D: TF-IDF-weighted n-gram cosine with length penalty
    (Vedantam et al., 2015)."""
    cand_toks = [_tok(c) for c in candidates]
    ref_toks = [[_tok(r) for r in refs] for refs in references]
    n_imgs = len(cand_toks)

    # document frequency over reference sets
    dfs = [defaultdict(float) for _ in range(n_max)]
    for refs in ref_toks:
        for n in range(n_max):
            seen = set()
            for r in refs:
                seen.update(_ngrams(r, n + 1).keys())
            for g in seen:
                dfs[n][g] += 1

    def tfidf_vec(tokens, n):
        cnt = _ngrams(tokens, n + 1)
        vec = {}
        norm = 0.0
        for g, c in cnt.items():
            idf = math.log(max(n_imgs, 1.0)) - math.log(
                max(dfs[n].get(g, 0.0), 1.0))
            v = c * idf
            vec[g] = v
            norm += v * v
        return vec, math.sqrt(norm)

    scores = []
    for cand, refs in zip(cand_toks, ref_toks):
        score_n = np.zeros(n_max)
        for n in range(n_max):
            cv, cn = tfidf_vec(cand, n)
            for r in refs:
                rv, rn = tfidf_vec(r, n)
                num = sum(min(cv[g], rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g in cv)
                delta = len(cand) - len(r)
                penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
                if cn > 0 and rn > 0:
                    score_n[n] += penalty * num / (cn * rn)
            score_n[n] /= max(len(refs), 1)
        scores.append(10.0 * score_n.mean())
    return float(np.mean(scores)) if scores else 0.0


def evaluate_captioning(params, coca_cfg, tokenizer, dataset, key,
                        seq_len: int = 30,
                        generation_type: str = "beam_search",
                        num_beams: int = 6,
                        num_beam_groups: int = 3) -> Dict[str, float]:
    """dataset iterates (images [B,H,W,3] in [0,1], reference-caption
    lists); generates with the CoCa decoder and scores BLEU-4/CIDEr-D.

    The default is group beam search with open_clip's generate()
    defaults (K=6, G=3) because that is exactly what the reference
    benchmark runs — `clip_benchmark/metrics/captioning.py:86` calls
    `model.generate(img)` with no arguments.  `generation_type="top_k"`
    selects the greedy/sampling scan instead (faster, and what `key`
    feeds)."""
    import jax
    import jax.numpy as jnp

    from leaf_tpu.attacks.image import _normalize_images
    from leaf_tpu.models.coca import generate, generate_beamsearch

    candidates: List[str] = []
    references: List[List[str]] = []
    for images, caption_lists in dataset:
        key, sub = jax.random.split(key)
        norm = _normalize_images(jnp.asarray(images), coca_cfg)
        if generation_type == "beam_search":
            tokens = generate_beamsearch(params, coca_cfg, norm,
                                         num_beams=num_beams,
                                         num_beam_groups=num_beam_groups,
                                         seq_len=seq_len)
        else:
            tokens = generate(params, coca_cfg, norm, sub, seq_len=seq_len)
        # cut at the model's OWN eos id (roberta CoCa: eos 2; CLIP
        # BPE: 49407) — a hardcoded CLIP special set left pad/eos runs
        # in HF-tower captions and stripped genuine '!' (BPE id 0 ==
        # the pad value) from mid-caption.  generate() only writes pad
        # after EOS, so break-at-EOS needs no pad stripping — but a
        # beam hypothesis that ran the full length carries NO eos
        # (BeamSearchScorer.finalize appends one only when it fits), so
        # bound the scan to the generation cap: everything past it is
        # pad fill, never caption.
        limit = min(seq_len, coca_cfg.multimodal.context_length)
        for row, refs in zip(np.asarray(tokens), caption_lists):
            ids = []
            for t in row[1:limit]:      # row[0] is the SOT slot
                if int(t) in (coca_cfg.eos_token_id,
                              coca_cfg.sot_token_id):
                    break
                ids.append(int(t))
            candidates.append(tokenizer.decode(ids))
            references.append(list(refs) if isinstance(refs, (list, tuple))
                              else [refs])
    return {"bleu4": bleu4(candidates, references),
            "cider_d": cider_d(candidates, references),
            "num_samples": len(candidates)}
