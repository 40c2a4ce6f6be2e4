"""Pretrained checkpoint registry + verified downloader.

Equivalent of the reference's `src/open_clip/pretrained.py:29-655`:
a registry mapping (model, tag) → URL + sha256 prefix, a cached
downloader with hash verification and corrupt-cache retry (the
behaviour the reference pins in `tests/test_download_pretrained.py`),
and the HF-hub naming conventions used by the LEAF release artifacts
(`LEAF-CLIP/CLIP-ViT-{L,H,g,bigG}-rho50-k1-constrained[-FARE2]`).

Offline-first: when the cache already holds a verified file nothing is
fetched; the `url_retrieve` hook is injectable for tests and air-gapped
mirrors.
"""
from __future__ import annotations

import hashlib
import logging
import os
import urllib.request
import warnings
from typing import Callable, Dict, Optional

LOG = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/leaf_tpu/checkpoints")

# (model, tag) → {url, sha256 prefix}.  URLs follow the upstream
# open_clip/LAION hosting scheme; LEAF release artifacts are HF repos.
_PRETRAINED: Dict[str, Dict[str, Dict[str, str]]] = {
    "ViT-B-32": {
        "openai": dict(
            url="https://openaipublic.azureedge.net/clip/models/"
                "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58"
                "eba950af/ViT-B-32.pt",
            sha256="40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58"),
    },
    "ViT-L-14": {
        "openai": dict(
            url="https://openaipublic.azureedge.net/clip/models/"
                "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737"
                "a03836/ViT-L-14.pt",
            sha256="b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca17"),
        "fare2": dict(url="hf-hub:chs20/fare2-clip", sha256=""),
        "leaf": dict(
            url="hf-hub:LEAF-CLIP/CLIP-ViT-L-rho50-k1-constrained-FARE2",
            sha256=""),
    },
    "ViT-H-14": {
        "laion2b": dict(
            url="hf-hub:laion/CLIP-ViT-H-14-laion2B-s32B-b79K", sha256=""),
        "leaf": dict(
            url="hf-hub:LEAF-CLIP/CLIP-ViT-H-rho50-k1-constrained-FARE2",
            sha256=""),
    },
    "ViT-g-14": {
        "laion2b": dict(
            url="hf-hub:laion/CLIP-ViT-g-14-laion2B-s12B-b42K", sha256=""),
        "leaf": dict(
            url="hf-hub:LEAF-CLIP/CLIP-ViT-g-rho50-k1-constrained-FARE2",
            sha256=""),
    },
    "ViT-bigG-14": {
        "laion2b": dict(
            url="hf-hub:laion/CLIP-ViT-bigG-14-laion2B-39B-b160k", sha256=""),
        "leaf": dict(
            url="hf-hub:LEAF-CLIP/CLIP-ViT-bigG-rho50-k1-constrained-FARE2",
            sha256=""),
    },
}


def list_pretrained():
    return [(m, t) for m, tags in _PRETRAINED.items() for t in tags]


def get_pretrained_cfg(model: str, tag: str) -> Dict[str, str]:
    return dict(_PRETRAINED.get(model, {}).get(tag, {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def check_sha256(path: str, expected_prefix: str) -> bool:
    if not expected_prefix:
        return True
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(expected_prefix)


def download_pretrained_from_url(
    url: str,
    cache_dir: Optional[str] = None,
    expected_sha256: Optional[str] = None,
    url_retrieve: Optional[Callable[[str, str], None]] = None,
) -> str:
    """Download (or reuse) a checkpoint with sha256 verification.

    Matches the reference semantics (`pretrained.py:590-640`): a cached
    file with a matching hash short-circuits; a cached file with a
    wrong hash triggers a re-download; a re-downloaded file that still
    mismatches raises.
    """
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url)
    if expected_sha256 is None:
        # infer from openai-style URLs: …/<sha>/<file>
        parts = url.split("/")
        expected_sha256 = parts[-2] if len(parts) > 2 and len(parts[-2]) >= 40 \
            else ""
    target = os.path.join(cache_dir, filename)

    if os.path.exists(target):
        if check_sha256(target, expected_sha256):
            return target
        warnings.warn(f"{target} exists but the SHA256 does not match; "
                      "re-downloading")
        os.remove(target)

    fetch = url_retrieve or (lambda u, t: urllib.request.urlretrieve(u, t))
    fetch(url, target)
    if not check_sha256(target, expected_sha256):
        raise RuntimeError(
            f"checkpoint downloaded from {url} does not match its sha256")
    return target


def resolve_pretrained(model: str, tag_or_path: str,
                       cache_dir: Optional[str] = None) -> str:
    """Registry tag → local path (downloading if needed); paths and
    hf-hub ids pass through."""
    if os.path.exists(tag_or_path) or tag_or_path.startswith("hf-hub:"):
        return tag_or_path
    cfg = get_pretrained_cfg(model, tag_or_path)
    if not cfg:
        return tag_or_path
    url = cfg["url"]
    if url.startswith("hf-hub:"):
        return url
    return download_pretrained_from_url(url, cache_dir, cfg.get("sha256"))
