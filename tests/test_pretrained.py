"""Downloader tests with a mocked network (mirrors the reference's
`tests/test_download_pretrained.py` strategy: fake checkpoint bytes,
sha256 mismatch → retry, persistent mismatch → error)."""
import hashlib
import os

import pytest

from leaf_tpu.models.pretrained import (
    check_sha256,
    download_pretrained_from_url,
    get_pretrained_url,
    list_pretrained,
    resolve_pretrained,
)


@pytest.fixture
def fake_server():
    """Injectable url_retrieve writing known bytes; counts calls."""
    class Server:
        def __init__(self):
            self.payload = b"fake checkpoint bytes"
            self.calls = 0

        def __call__(self, url, target):
            self.calls += 1
            with open(target, "wb") as f:
                f.write(self.payload)

        @property
        def sha(self):
            return hashlib.sha256(self.payload).hexdigest()

    return Server()


def test_registry_surface():
    pairs = list_pretrained()
    assert ("ViT-L-14", "openai") in pairs
    assert ("ViT-L-14", "leaf") in pairs
    assert get_pretrained_url("ViT-H-14", "leaf").startswith("hf-hub:LEAF-CLIP/")


def test_download_and_cache(tmp_path, fake_server):
    url = "https://example.com/model/" + fake_server.sha + "/ckpt.pt"
    p = download_pretrained_from_url(url, str(tmp_path),
                                     url_retrieve=fake_server)
    assert os.path.exists(p)
    assert fake_server.calls == 1
    # second call hits the verified cache — no download
    p2 = download_pretrained_from_url(url, str(tmp_path),
                                      url_retrieve=fake_server)
    assert p2 == p and fake_server.calls == 1


def test_corrupt_cache_triggers_redownload(tmp_path, fake_server):
    url = "https://example.com/model/" + fake_server.sha + "/ckpt.pt"
    bad = tmp_path / "ckpt.pt"
    bad.write_bytes(b"corrupted")
    with pytest.warns(UserWarning):
        p = download_pretrained_from_url(url, str(tmp_path),
                                         url_retrieve=fake_server)
    assert fake_server.calls == 1
    assert check_sha256(p, fake_server.sha)


def test_persistent_mismatch_raises(tmp_path, fake_server):
    url = "https://example.com/model/" + "0" * 64 + "/ckpt.pt"
    with pytest.raises(RuntimeError, match="sha256"):
        download_pretrained_from_url(url, str(tmp_path),
                                     url_retrieve=fake_server)


def test_resolve_passthrough(tmp_path):
    f = tmp_path / "local.safetensors"
    f.write_bytes(b"x")
    assert resolve_pretrained("ViT-L-14", str(f)) == str(f)
    assert resolve_pretrained("ViT-L-14", "hf-hub:foo/bar") == "hf-hub:foo/bar"
    assert resolve_pretrained("ViT-L-14", "fare2") == "hf-hub:chs20/fare2-clip"
