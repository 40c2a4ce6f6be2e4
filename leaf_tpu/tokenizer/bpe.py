"""Byte-pair-encoding CLIP tokenizer (host side).

Re-implementation of the OpenAI CLIP byte-BPE scheme (reference:
`/root/reference/src/open_clip/tokenizer.py:133-265`; vocab asset
`bpe_simple_vocab_16e6.txt.gz`, 49408 ids, SOT=49406, EOT=49407,
context length 77).  Behavioural parity is pinned by
`tests/test_tokenizer.py`, which cross-checks against HuggingFace's
independent `CLIPTokenizer` built from the same merge table.

Designed for the LEAF workload, where the tokenizer is the host-side hot
path (SURVEY.md §7 "hard parts" #2): every attack round tokenizes up to
2·B·ρ mutated strings.  Differences from the reference implementation:

  * word→token-ids cache keyed on the *raw regex token* (skips the
    byte-encode step on hits), shared across the batch;
  * `encode_batch` and `tokenize_arrays` return fixed-shape NumPy
    int32 buffers ready to ship to device — no torch;
  * optional native C++ fast path (leaf_tpu/tokenizer/native) used
    transparently when the shared library has been built.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np

try:  # text fixing is optional (ascii-only attack text is unaffected)
    import ftfy

    def _fix_text(t: str) -> str:
        return ftfy.fix_text(t)
except ImportError:  # pragma: no cover
    def _fix_text(t: str) -> str:
        return t

import regex as re

# printable ASCII without '&' (html-unescape divergence) -- the
# native fast-path contract; control chars would truncate at NUL
_NATIVE_SAFE = re.compile(r"[ -%'-~]*")

DEFAULT_CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT_ID = 49406
EOT_ID = 49407

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "models", "assets")
DEFAULT_BPE_PATH = os.path.join(_ASSET_DIR, "bpe_simple_vocab_16e6.txt.gz")

_WORD_PATTERN = (
    r"""<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d"""
    r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
)


@functools.lru_cache()
def byte_to_unicode() -> dict:
    """Reversible byte→printable-unicode map (standard GPT-2/CLIP scheme).

    Insertion order matters: the first 256 vocab ids follow this dict's
    order, which is printable bytes first ('!'..'~', '¡'..'¬', '®'..'ÿ')
    then the remaining bytes mapped to shifted codepoints — e.g. 'a' is
    id 64 and 'a</w>' id 320 in the canonical CLIP vocab.
    """
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("¡"), ord("¬") + 1))
                 + list(range(ord("®"), ord("ÿ") + 1)))
    mapping = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def basic_clean(text: str) -> str:
    text = _fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return " ".join(text.split()).strip()


def clean_lower(text: str) -> str:
    return whitespace_clean(basic_clean(text)).lower()


class CLIPTokenizer:
    """CLIP byte-BPE tokenizer with batched fixed-shape output."""

    def __init__(self,
                 bpe_path: str = DEFAULT_BPE_PATH,
                 context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH):
        b2u = byte_to_unicode()
        self._byte_enc = [b2u[b] for b in range(256)]
        self._byte_dec = {v: k for k, v in b2u.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a version header; 48894 merges follow (49152-256-2 slots)
        merges = [tuple(line.split()) for line in lines[1:48894 + 1]]

        vocab: List[str] = list(b2u.values())
        vocab += [tok + "</w>" for tok in b2u.values()]
        vocab += ["".join(pair) for pair in merges]
        vocab += ["<start_of_text>", "<end_of_text>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.merge_rank = {pair: i for i, pair in enumerate(merges)}

        self.vocab_size = len(vocab)
        self.sot_token_id = self.encoder["<start_of_text>"]
        self.eot_token_id = self.encoder["<end_of_text>"]
        self.context_length = context_length
        self.pattern = re.compile(_WORD_PATTERN, re.IGNORECASE)
        # raw-regex-token → tuple of ids.  Unbounded by design: the LEAF
        # attack mutates a small vocabulary of short words, so the working
        # set is tiny relative to host RAM.
        self._cache: dict = {
            "<start_of_text>": (self.sot_token_id,),
            "<end_of_text>": (self.eot_token_id,),
        }
        self._bpe_path = bpe_path
        self._native = None
        self._native_checked = False

    # -- core BPE ----------------------------------------------------------

    def _bpe_ids(self, token: str) -> tuple:
        """Encode one regex token into BPE ids (cached)."""
        hit = self._cache.get(token)
        if hit is not None:
            return hit
        units = [self._byte_enc[b] for b in token.encode("utf-8")]
        units[-1] += "</w>"
        rank = self.merge_rank
        # iteratively merge the lowest-rank adjacent pair
        while len(units) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(units) - 1):
                r = rank.get((units[i], units[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i < 0:
                break
            merged = units[best_i] + units[best_i + 1]
            # merge *every* occurrence of this pair left-to-right
            out = []
            i = 0
            first, second = units[best_i], units[best_i + 1]
            while i < len(units):
                if i < len(units) - 1 and units[i] == first and units[i + 1] == second:
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            units = out
        enc = self.encoder
        ids = tuple(enc[u] for u in units)
        self._cache[token] = ids
        return ids

    def encode(self, text: str) -> List[int]:
        """Encode one string → list of BPE ids (no SOT/EOT)."""
        out: List[int] = []
        for token in self.pattern.findall(clean_lower(text)):
            out.extend(self._bpe_ids(token))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self._byte_dec[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # -- batched fixed-shape API ------------------------------------------

    def __call__(self, texts: Union[str, Sequence[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        """Tokenize to a fixed [N, context_length] int32 array.

        Matches the reference semantics (`tokenizer.py:229-264`): SOT +
        ids + EOT, zero padding, truncation keeps EOT as the final token.
        """
        if isinstance(texts, str):
            texts = [texts]
        ctx = context_length or self.context_length
        # native C++ fast path for PRINTABLE-ASCII batches (the attack
        # workload); '&' is excluded because the Python clean
        # html-unescapes it, and control chars because c_char_p
        # truncates at NUL (ftfy also strips them on the Python path)
        if not self._native_checked:
            from leaf_tpu.tokenizer.native_binding import get_native
            self._native = get_native(self._bpe_path)
            self._native_checked = True
        if self._native is not None and all(
                _NATIVE_SAFE.fullmatch(t) for t in texts):
            return self._native.encode_batch(list(texts), ctx)
        result = np.zeros((len(texts), ctx), dtype=np.int32)
        sot, eot = self.sot_token_id, self.eot_token_id
        for i, text in enumerate(texts):
            ids = self.encode(text)
            if len(ids) > ctx - 2:
                ids = ids[:ctx - 2]
                result[i, :] = [sot] + ids + [eot]
            else:
                result[i, 0] = sot
                result[i, 1:1 + len(ids)] = ids
                result[i, 1 + len(ids)] = eot
        return result

    def tokenize_arrays(self, texts: Sequence[str],
                        context_length: Optional[int] = None):
        """Tokenize → (tokens [N,C] int32, lengths [N] int32)."""
        # length = EOT position + 1 (EOT is the max id) — NOT a nonzero
        # count: vocab id 0 is the non-final '!' byte token and can
        # legitimately appear mid-sequence
        toks = self(texts, context_length)
        lengths = (toks.argmax(axis=-1) + 1).astype(np.int32)
        return toks, lengths


@functools.lru_cache()
def get_tokenizer(context_length: int = DEFAULT_CONTEXT_LENGTH) -> CLIPTokenizer:
    return CLIPTokenizer(context_length=context_length)
