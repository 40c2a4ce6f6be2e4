"""Data pipeline tests: tar shards built on the fly (mirrors the
reference's `tests/test_wds.py` strategy), sharding determinism,
equal-batch rounding, synthetic + textcls adapters."""
import io
import os
import tarfile

import numpy as np
import pytest

from leaf_tpu.data import (
    SyntheticDataset,
    TextClassificationData,
    WdsConfig,
    WdsDataset,
    char_vocabulary,
    expand_urls,
    get_synthetic_dataset,
    get_wds_dataset,
)
from leaf_tpu.data.common import shuffle_buffer
from leaf_tpu.data.imagenet import ImageFolderDataset


def make_shard(path, n, key_offset=0, image_size=8):
    from PIL import Image
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{key_offset + i:06d}"
            img = Image.fromarray(
                np.full((image_size, image_size, 3), i % 255, np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption number {key_offset + i}".encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
    return path


def test_expand_urls_reference_num_shards_table():
    """The reference's tests/test_num_shards.py table, verbatim."""
    cases = [
        ("/path/to/shard.tar", 1),
        ("/path/to/shard_{000..000}.tar", 1),
        ("/path/to/shard_{000..009}.tar", 10),
        ("/path/to/shard_{000..009}_{000..009}.tar", 100),
        ("/path/to/shard.tar::/path/to/other_shard_{000..009}.tar", 11),
        ("/path/to/shard_{000..009}.tar::/path/to/other_shard_{000..009}.tar",
         20),
        (["/path/to/shard.tar"], 1),
        (["/path/to/shard.tar", "/path/to/other_shard.tar"], 2),
    ]
    for shards, expected in cases:
        assert len(expand_urls(shards)) == expected, shards
    # cartesian expansion preserves order + zero padding
    assert expand_urls("s_{00..01}_{7..8}.tar") == [
        "s_00_7.tar", "s_00_8.tar", "s_01_7.tar", "s_01_8.tar"]


def test_expand_urls():
    assert expand_urls("s-{000..002}.tar") == [
        "s-000.tar", "s-001.tar", "s-002.tar"]
    assert expand_urls("a.tar::b.tar") == ["a.tar", "b.tar"]
    assert expand_urls(["x.tar"]) == ["x.tar"]


def test_expand_urls_comma_alternation():
    assert expand_urls("s_{train,val}.tar") == ["s_train.tar",
                                                "s_val.tar"]
    assert expand_urls("s_{a,b}_{0..1}.tar") == [
        "s_a_0.tar", "s_a_1.tar", "s_b_0.tar", "s_b_1.tar"]


def test_wds_pipe_url_streams(tmp_path):
    """`pipe:cmd` shard urls stream through a subprocess like the
    reference's webdataset (`pipe:aws s3 cp ... -`)."""
    make_shard(tmp_path / "p.tar", 6)
    from leaf_tpu.data.wds import iter_tar_samples
    got = list(iter_tar_samples(f"pipe:cat {tmp_path}/p.tar"))
    assert len(got) == 6


def test_wds_rollover_reshuffles(tmp_path):
    """Equal-batch rounding re-runs the dataset when num_samples
    exceeds what is on disk; the second pass must NOT replay the first
    pass byte-identically (reference detshuffle2 bumps its epoch)."""
    make_shard(tmp_path / "r.tar", 8)
    cfg = WdsConfig(urls=str(tmp_path / "r.tar"), batch_size=8,
                    is_train=True, seed=0, num_samples=16)
    ds = WdsDataset(cfg, preprocess=None)
    ds.set_epoch(0)
    batches = [texts for _, texts in iter(ds)]
    assert len(batches) == 2
    assert sorted(batches[0]) == sorted(batches[1])  # same multiset
    assert batches[0] != batches[1]                  # different order


def test_wds_empty_shard_slice_raises(tmp_path):
    """A host whose slice yields nothing must fail loudly: silently
    under-producing batches would deadlock the other hosts at the next
    collective step."""
    cfg = WdsConfig(urls=str(tmp_path / "missing-{000..001}.tar"),
                    batch_size=4, is_train=True, num_samples=8)
    ds = WdsDataset(cfg, preprocess=None)
    ds.set_epoch(0)
    with pytest.raises(RuntimeError, match="produced no samples"):
        list(iter(ds))


def test_wds_reads_all_samples(tmp_path):
    make_shard(tmp_path / "s-000.tar", 10)
    make_shard(tmp_path / "s-001.tar", 5, key_offset=10)
    cfg = WdsConfig(urls=str(tmp_path / "s-{000..001}.tar"), batch_size=4,
                    is_train=False)
    ds = WdsDataset(cfg)
    texts = []
    for images, txts in ds:
        assert images.shape[1:] == (8, 8, 3)
        texts.extend(txts)
    assert sorted(texts) == sorted(f"caption number {i}" for i in range(15))


def test_wds_train_equal_batches(tmp_path):
    """Train mode yields exactly num_batches full batches, rolling over
    the dataset if needed (equal-batch rounding, data_AT.py:513-521)."""
    make_shard(tmp_path / "s-000.tar", 10)
    cfg = WdsConfig(urls=str(tmp_path / "s-000.tar"), batch_size=4,
                    is_train=True, num_samples=10, seed=0,
                    sample_shuffle_size=8, sample_shuffle_initial=2)
    info = get_wds_dataset(cfg)
    batches = list(info.loader)
    assert len(batches) == info.num_batches == 3  # ceil(10/4)
    assert all(len(t) == 4 for _, t in batches)


def test_wds_deterministic_epoch_shuffle(tmp_path):
    for i in range(4):
        make_shard(tmp_path / f"s-{i:03d}.tar", 4, key_offset=4 * i)
    cfg = dict(urls=str(tmp_path / "s-{000..003}.tar"), batch_size=4,
               is_train=True, num_samples=16, seed=7,
               sample_shuffle_size=4, sample_shuffle_initial=1)
    a = WdsDataset(WdsConfig(**cfg))
    b = WdsDataset(WdsConfig(**cfg))
    ta = [t for _, txts in a for t in txts]
    tb = [t for _, txts in b for t in txts]
    assert ta == tb
    # next epoch differs
    ta2 = [t for _, txts in a for t in txts]
    assert ta2 != ta


def test_wds_host_sharding(tmp_path):
    for i in range(4):
        make_shard(tmp_path / f"s-{i:03d}.tar", 4, key_offset=4 * i)
    base = dict(urls=str(tmp_path / "s-{000..003}.tar"), batch_size=2,
                is_train=True, num_samples=8, seed=0, process_count=2,
                sample_shuffle_size=4, sample_shuffle_initial=1)
    d0 = WdsDataset(WdsConfig(process_index=0, **base))
    d1 = WdsDataset(WdsConfig(process_index=1, **base))
    s0 = {u for u in d0._shards_for_epoch(0)}
    s1 = {u for u in d1._shards_for_epoch(0)}
    assert s0.isdisjoint(s1)
    assert len(s0 | s1) == 4


def test_expand_urls_with_weights():
    """Per-SOURCE factors expand to per-shard weights (reference
    `data_AT.py:86-103`); count mismatch and non-resampled use error."""
    from leaf_tpu.data.wds import expand_urls_with_weights

    urls, w = expand_urls_with_weights(
        "a-{000..002}.tar::b.tar", "2::1")
    assert urls == ["a-000.tar", "a-001.tar", "a-002.tar", "b.tar"]
    assert w == [2.0, 2.0, 2.0, 1.0]
    with pytest.raises(ValueError, match="per data source"):
        expand_urls_with_weights("a.tar::b.tar", "1::2::3")
    with pytest.raises(ValueError, match="resampled"):
        WdsDataset(WdsConfig(urls="a.tar::b.tar", batch_size=2,
                             is_train=True, upsampling_factors="1::2"))


def _source_counts(tmp_path, urls, factors, epochs=60):
    """Count samples drawn per source over many resampled epochs."""
    cfg = WdsConfig(urls=urls, batch_size=5, is_train=True, resampled=True,
                    seed=0, upsampling_factors=factors, num_samples=20,
                    sample_shuffle_size=1, sample_shuffle_initial=1,
                    workers=1)
    ds = WdsDataset(cfg)
    counts = {}
    for ep in range(epochs):
        ds.set_epoch(ep)
        for _, texts in ds:
            for t in texts:
                src = "a" if int(t.split()[-1]) < 10 else "b"
                counts[src] = counts.get(src, 0) + 1
    return counts


def test_wds_resampled_sampling_frequencies(tmp_path):
    """The reference's statistical resampling test (`tests/test_wds.py`):
    with two equal-size sources, unweighted resampling draws ~50/50 and
    2::1 upsampling draws ~2:1 (rtol 0.2)."""
    make_shard(tmp_path / "a-000.tar", 5)
    make_shard(tmp_path / "a-001.tar", 5, key_offset=5)
    make_shard(tmp_path / "b-000.tar", 5, key_offset=10)
    make_shard(tmp_path / "b-001.tar", 5, key_offset=15)
    urls = (str(tmp_path / "a-{000..001}.tar") + "::"
            + str(tmp_path / "b-{000..001}.tar"))

    counts = _source_counts(tmp_path, urls, None)
    total = counts["a"] + counts["b"]
    np.testing.assert_allclose(counts["a"] / total, 0.5, rtol=0.2)

    counts = _source_counts(tmp_path, urls, "2::1")
    ratio = counts["a"] / counts["b"]
    np.testing.assert_allclose(ratio, 2.0, rtol=0.2)


def test_wds_skips_corrupt_members(tmp_path):
    p = tmp_path / "bad.tar"
    make_shard(p, 3)
    with tarfile.open(p, "a") as tf:
        junk = b"not an image"
        info = tarfile.TarInfo("zzz.png")
        info.size = len(junk)
        tf.addfile(info, io.BytesIO(junk))
        txt = b"junk caption"
        info = tarfile.TarInfo("zzz.txt")
        info.size = len(txt)
        tf.addfile(info, io.BytesIO(txt))
    cfg = WdsConfig(urls=str(p), batch_size=2, is_train=False)
    texts = [t for _, txts in WdsDataset(cfg) for t in txts]
    assert len(texts) == 3  # corrupt sample dropped, no crash


def test_shuffle_buffer_preserves_multiset():
    import random
    data = list(range(100))
    out = list(shuffle_buffer(iter(data), 16, 4, random.Random(0)))
    assert sorted(out) == data
    assert out != data


def test_synthetic():
    info = get_synthetic_dataset(32, 8, image_size=16)
    batches = list(info.loader)
    assert len(batches) == 4
    imgs, texts = batches[0]
    assert imgs.shape == (8, 16, 16, 3)
    assert texts == ["Dummy caption"] * 8


def test_char_vocabulary():
    V = char_vocabulary(["abc", "abd"])
    assert set(V) == {-1, ord("a"), ord("b"), ord("c"), ord("d")}


def test_textcls_from_samples():
    samples = [{"text": "stocks rally on earnings", "label": 2},
               {"text": "team wins the cup", "label": 1}]
    d = TextClassificationData.from_samples("agnews", samples)
    assert d.num_classes == 4
    assert d.template == "{}"
    assert all(os.path.exists(p) for p in d.anchor_image_paths)
    assert -1 in d.vocab and ord("s") in d.vocab


def test_image_folder(tmp_path):
    from PIL import Image
    for cls in ("a_cls", "b_cls"):
        os.makedirs(tmp_path / cls)
        for i in range(3):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                tmp_path / cls / f"{i}.png")
    pre = lambda img: np.asarray(img.convert("RGB"), np.float32) / 255.0
    ds = ImageFolderDataset(str(tmp_path), pre, batch_size=4)
    assert len(ds) == 6 and ds.classes == ["a_cls", "b_cls"]
    batches = list(ds)
    assert sum(len(l) for _, l in batches) == 6
    labels = np.concatenate([l for _, l in batches])
    assert sorted(labels.tolist()) == [0, 0, 0, 1, 1, 1]
    ds2 = ImageFolderDataset(str(tmp_path), pre, batch_size=4,
                             subsample_per_class=2)
    assert len(ds2) == 4


def test_coco_retrieval_dataset(tmp_path):
    import json
    from PIL import Image
    from leaf_tpu.data.coco import CocoRetrievalDataset
    (tmp_path / "imgs").mkdir()
    ann = []
    for i in range(3):
        name = f"imgs/{i}.jpg"
        Image.fromarray(np.full((8, 8, 3), i * 20, np.uint8)).save(
            tmp_path / name)
        ann.append({"image": name,
                    "caption": [f"A Photo of thing {i}!",
                                f"another view of thing {i}."]})
    with open(tmp_path / "karpathy.json", "w") as f:
        json.dump(ann, f)
    pre = lambda img: np.asarray(img.convert("RGB"), np.float32) / 255.0
    ds = CocoRetrievalDataset(str(tmp_path), str(tmp_path / "karpathy.json"),
                              pre, batch_size=2)
    assert len(ds) == 3 and len(ds.text) == 6
    assert ds.text[0] == "a photo of thing 0"      # pre_caption applied
    assert ds.img2txt[1] == [2, 3] and ds.txt2img[3] == 1
    batches = list(ds.image_batches())
    assert sum(b.shape[0] for b in batches) == 3


def test_wds_text_only_skips_decode(tmp_path, monkeypatch):
    """text_only mode yields the same texts with images=None and never
    imports/touches PIL decode (VERDICT r1 weak #6)."""
    p = str(tmp_path / "s-0000.tar")
    make_shard(p, 12)
    full = WdsDataset(WdsConfig(urls=p, batch_size=4, is_train=True,
                                num_samples=12, seed=3), preprocess=None)
    full.set_epoch(-1)
    texts_full = [t for _, ts in full for t in ts]

    import PIL.Image

    def boom(*a, **k):
        raise AssertionError("PIL decode called in text_only mode")

    monkeypatch.setattr(PIL.Image, "open", boom)
    to = WdsDataset(WdsConfig(urls=p, batch_size=4, is_train=True,
                              num_samples=12, seed=3, text_only=True),
                    preprocess=None)
    to.set_epoch(-1)
    batches = list(to)
    assert all(img is None for img, _ in batches)
    texts_to = [t for _, ts in batches for t in ts]
    assert texts_to == texts_full


def test_wds_parallel_decode_order(tmp_path):
    """Threaded decode (--workers) is order-preserving: identical
    batches to single-threaded decode."""
    p = str(tmp_path / "s-0000.tar")
    make_shard(p, 16)
    outs = []
    for w in (1, 4):
        ds = WdsDataset(WdsConfig(urls=p, batch_size=4, is_train=True,
                                  num_samples=16, seed=5, workers=w),
                        preprocess=None)
        ds.set_epoch(-1)
        outs.append(list(ds))
    for (ia, ta), (ib, tb) in zip(*outs):
        assert ta == tb
        np.testing.assert_array_equal(ia, ib)


def test_prefetcher_terminates_when_queue_saturated():
    """Regression: the _END marker must be delivered even when the
    queue is full at source exhaustion (a dropped marker hangs the
    consumer forever), and abandoning the iterator must stop the
    worker."""
    from leaf_tpu.data.common import Prefetcher
    assert list(Prefetcher(iter(range(100)), depth=2)) == list(range(100))
    it = iter(Prefetcher(iter(range(1000)), depth=2))
    assert next(it) == 0
    it.close()  # must not deadlock or leave a spinning worker


def test_text_only_tar_without_images(tmp_path):
    """A caption-only tar (no image members at all) must feed the
    text_only pipeline; non-text_only mode still drops such samples."""
    import io
    import tarfile

    from leaf_tpu.data.wds import WdsConfig, get_wds_dataset

    path = tmp_path / "cap-0000.tar"
    with tarfile.open(path, "w") as tf:
        for i in range(6):
            data = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    info = get_wds_dataset(
        WdsConfig(urls=str(path), batch_size=3, is_train=True,
                  num_samples=6, text_only=True), preprocess=None)
    texts = [t for _, batch in info.loader for t in batch]
    assert len(texts) == 6 and all(t.startswith("caption") for t in texts)

    info2 = get_wds_dataset(
        WdsConfig(urls=str(path), batch_size=3, is_train=False,
                  num_samples=6), preprocess=None)
    assert sum(1 for _ in info2.loader) == 0


def _write_csv(tmp_path, n=12):
    from PIL import Image
    rng = np.random.default_rng(0)
    rows = ["filepath\ttitle"]
    for i in range(n):
        p = tmp_path / f"c{i}.png"
        Image.fromarray(rng.integers(0, 255, (8, 8, 3)).astype(
            np.uint8)).save(p)
        rows.append(f"{p}\tcaption {i}")
    f = tmp_path / "d.csv"
    f.write_text("\n".join(rows) + "\n")
    return str(f)


def test_csv_multihost_sharding_is_disjoint(tmp_path):
    """Each host must read a disjoint stride of the shuffled order
    (DistributedSampler semantics) — without it, put_batch stitches
    process_count duplicate copies into the global batch."""
    from leaf_tpu.data.csv_data import get_csv_dataset
    path = _write_csv(tmp_path, n=12)
    ident = lambda img: np.zeros((2, 2, 3), np.float32)  # noqa: E731
    seen = []
    for pi in range(2):
        info = get_csv_dataset(path, ident, batch_size=3, shuffle=True,
                               seed=0, drop_last=True,
                               process_index=pi, process_count=2)
        assert info.num_batches == 2   # 12 // 2 hosts // 3 per batch
        caps = []
        ds = info.dataset if hasattr(info, "dataset") else info.loader
        for _, texts in iter(info.loader):
            caps.extend(texts)
        seen.append(set(caps))
    assert seen[0] and seen[1]
    assert not (seen[0] & seen[1])     # disjoint across hosts


def test_imagefolder_multihost_sharding_is_disjoint(tmp_path):
    from PIL import Image
    from leaf_tpu.data.imagenet import get_imagenet
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3)).astype(
                np.uint8)).save(d / f"{i}.png")
    ident = lambda img: np.asarray(img, np.float32)  # noqa: E731
    seen = []
    for pi in range(2):
        info = get_imagenet(str(tmp_path), ident, "train", batch_size=3,
                            seed=0, process_index=pi, process_count=2)
        labels = []
        imgs_all = []
        for imgs, lab in iter(info.loader):
            imgs_all.extend(np.asarray(imgs).sum((1, 2, 3)).tolist())
            labels.extend(np.asarray(lab).tolist())
        seen.append(set(imgs_all))
        assert len(imgs_all) == 6      # 12 images / 2 hosts
    assert not (seen[0] & seen[1])


def test_resolve_resume_latest_missing_sidecar(tmp_path):
    from leaf_tpu.train.checkpoint import resolve_resume
    bogus = tmp_path / "epoch_latest"
    bogus.mkdir()
    with pytest.raises(ValueError, match="sidecar"):
        resolve_resume(str(bogus), str(tmp_path))


# -- length-bucketed batch composition (round 5) -------------------------

def make_varlen_shard(path, lengths, key_offset=0):
    """Caption-only tar whose captions have the given word counts."""
    with tarfile.open(path, "w") as tf:
        for i, n_words in enumerate(lengths):
            key = f"{key_offset + i:06d}"
            txt = " ".join(["word"] * n_words).encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
    return path


def test_bucket_batches_helper():
    """common.bucket_batches: emit when a bucket fills; flush leftovers
    longest-first at stream end (partial final batch allowed)."""
    from leaf_tpu.data.common import bucket_batches, bucket_for

    items = [1, 2, 17, 3, 18, 4, 19, 90, 5]  # lengths == identity
    out = list(bucket_batches(iter(items), 2, lambda x: x, (16, 32, 77)))
    # first fills: [1,2] (bucket 16), [17,18] (32), [3,4] (16)
    assert out[:3] == [[1, 2], [17, 18], [3, 4]]
    # leftovers longest-first: 90 (overflow -> 77), 19 (32), 5 (16)
    assert out[3:] == [[90, 19], [5]]
    assert bucket_for(77, [16, 32, 77]) == 77
    assert bucket_for(400, [16, 32, 77]) == 77


def test_wds_bucket_by_length_train(tmp_path):
    """Train mode with bucket_by_length: every emitted batch is full
    size AND length-homogeneous (all captions in one context bucket),
    and equal-batch rounding still yields exactly num_batches."""
    from leaf_tpu.data.common import bucket_for

    p = str(tmp_path / "s-0000.tar")
    # 8 short (2 words), 8 medium (20 words), 8 long (60 words)
    make_varlen_shard(p, [2, 20, 60] * 8)
    length_fn = lambda t: len(t.split()) + 2  # noqa: E731
    bounds = (16, 32, 48, 64, 77)
    cfg = WdsConfig(urls=p, batch_size=4, is_train=True, num_samples=24,
                    seed=0, text_only=True, bucket_by_length=True,
                    length_fn=length_fn, length_buckets=bounds,
                    sample_shuffle_size=16, sample_shuffle_initial=4)
    batches = list(WdsDataset(cfg, preprocess=None))
    assert len(batches) == 6  # ceil(24/4)
    for _, texts in batches:
        assert len(texts) == 4
        bks = {bucket_for(length_fn(t), bounds) for t in texts}
        assert len(bks) == 1, (bks, texts)


def test_wds_bucket_by_length_eval_flushes_all(tmp_path):
    """Eval mode: bucketing must not drop samples — leftovers flush in
    (possibly mixed/partial) batches and the multiset is preserved."""
    p = str(tmp_path / "s-0000.tar")
    lengths = [2, 20, 60, 5, 33, 70, 9]
    make_varlen_shard(p, lengths)
    cfg = WdsConfig(urls=p, batch_size=4, is_train=False, text_only=True,
                    bucket_by_length=True,
                    length_fn=lambda t: len(t.split()) + 2)
    got = sorted(len(t.split()) for _, ts in WdsDataset(cfg, None)
                 for t in ts)
    assert got == sorted(lengths)


def test_wds_bucket_by_length_requires_length_fn(tmp_path):
    p = str(tmp_path / "s-0000.tar")
    make_varlen_shard(p, [2, 3, 4, 5])
    cfg = WdsConfig(urls=p, batch_size=2, is_train=False, text_only=True,
                    bucket_by_length=True)
    with pytest.raises(ValueError, match="length_fn"):
        list(WdsDataset(cfg, None))


def test_get_data_bucket_by_length_wiring(tmp_path):
    """--bucket-by-length wires a BPE token-count length_fn into the wds
    train pipeline (driver flag surface -> WdsConfig)."""
    from types import SimpleNamespace

    from leaf_tpu.data import get_data

    p = str(tmp_path / "s-0000.tar")
    make_varlen_shard(p, [2] * 6 + [40] * 6)
    args = SimpleNamespace(
        dataset_type="webdataset", train_data=p, batch_size=3,
        train_num_samples=12, seed=0, model="ViT-tiny-test",
        bucket_by_length=True, train_data_upsampling_factors=None,
        val_data=None, imagenet_val=None, imagenet_v2=None,
        val_text_classification=None, workers=1)
    data = get_data(args, preprocess=None, text_only=True)
    ds = data["train"].loader
    assert ds.cfg.bucket_by_length
    # the wired length_fn counts BPE tokens incl. SOT/EOT, capped at 77
    assert ds.cfg.length_fn("word word") == 4
    assert ds.cfg.length_fn(" ".join(["word"] * 100)) == 77
    for _, texts in ds:
        words = {len(t.split()) for t in texts}
        assert words in ({2}, {40})
