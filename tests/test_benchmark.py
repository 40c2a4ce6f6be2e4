"""Benchmark suite breadth: builder registry, multilingual prompts,
new metrics (caption selection, captioning), --beta interpolation,
wds classification layout, and the build subcommand."""
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from leaf_tpu.benchmark import builder as bld


def _img(rng):
    return Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB")


def make_imagefolder(root, classes=("cat", "dog"), per_class=3):
    rng = np.random.default_rng(0)
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            _img(rng).save(os.path.join(d, f"{i}.png"))


def test_language_assets_load():
    for lang in ("en", "cn", "it", "jp", "ar"):
        names = bld.load_language_classnames(lang)
        tpls = bld.load_language_templates(lang)
        assert "imagenet1k" in names and len(names["imagenet1k"]) == 1000
        assert tpls["imagenet1k"]
    # babel-imagenet: a translated SUBSET of classes (reference
    # babel_imagenet.py evaluates on those classes only)
    cls_de, _ = bld.classnames_and_templates("imagenetv2", "de")
    cls_en, _ = bld.classnames_and_templates("imagenetv2", "en")
    idxs, names = bld.load_babel_imagenet("de")
    assert len(cls_en) == 1000
    assert cls_de == names and len(idxs) == len(names) < 1000
    # the subset adapter remaps labels to subset positions
    base = [(np.zeros((3, 2, 2, 3), np.float32), np.asarray([idxs[0], 999999, idxs[1]]))]
    sub = bld.BabelSubsetDataset(base, idxs)
    (imgs, labels), = list(sub)
    assert labels.tolist() == [0, 1] and imgs.shape[0] == 2


def test_templates_are_c_format():
    # cifar10 classnames come from torchvision in the reference, so the
    # en json has no entry — folder classes are the fallback; the
    # template table DOES carry cifar10 prompts
    names, tpls = bld.classnames_and_templates(
        "cifar10", "en", fallback_classes=["cat", "dog"])
    assert names == ["cat", "dog"]
    assert any("photo" in t("dog") and "dog" in t("dog") for t in tpls)


def test_collections_and_default_tasks():
    assert "imagenetv2" in bld.DATASET_COLLECTIONS["imagenet_robustness"]
    assert bld.get_dataset_default_task("mscoco_captions") \
        == "zeroshot_retrieval"
    assert bld.get_dataset_default_task("sugar_crepe/add_att") \
        == "image_caption_selection"
    assert bld.get_dataset_default_task("cifar10") \
        == "zeroshot_classification"


def test_cli_imagefolder_classification(tmp_path):
    from leaf_tpu.benchmark.cli import main
    make_imagefolder(tmp_path / "data")
    out = tmp_path / "{dataset}_{task}.json"
    res = main(["eval", "--model", "ViT-tiny-test",
                "--dataset", "imagefolder",
                "--dataset-root", str(tmp_path / "data"),
                "--task", "zeroshot_classification",
                "--batch-size", "4", "--output", str(out)])
    m = res[0]["metrics"]
    assert 0.0 <= m["acc1"] <= 1.0
    assert os.path.exists(str(tmp_path / "imagefolder_"
                                         "zeroshot_classification.json"))


def test_cli_model_type_dispatch(tmp_path):
    """--model-type mirrors the reference TYPE2FUNC dispatch
    (model_loading/__init__.py): hf_clip rejects a --pretrained tag,
    ja_clip raises the upstream install hint when the optional package
    is absent."""
    import pytest

    from leaf_tpu.benchmark.cli import main
    make_imagefolder(tmp_path / "data")
    base = ["eval", "--dataset", "imagefolder",
            "--dataset-root", str(tmp_path / "data"),
            "--task", "zeroshot_classification", "--batch-size", "4"]
    with pytest.raises(ValueError, match="hf_clip"):
        main(base + ["--model", "LEAF-CLIP/x", "--model-type", "hf_clip",
                     "--pretrained", "openai"])
    with pytest.raises(ImportError, match="japanese_clip"):
        main(base + ["--model", "rinna/japanese-clip-vit-b-16",
                     "--model-type", "ja_clip"])
    # open_clip (default) unchanged
    res = main(base + ["--model", "ViT-tiny-test",
                       "--model-type", "open_clip"])
    assert 0.0 <= res[0]["metrics"]["acc1"] <= 1.0


def test_cli_interpolate_beta_zero_equals_other(tmp_path):
    """--interpolate --beta 0 must evaluate the OTHER checkpoint."""
    import jax

    from leaf_tpu.benchmark.cli import main
    from leaf_tpu.convert import save_state_dict
    from leaf_tpu.convert import params_to_openclip
    from leaf_tpu.models import create_model

    make_imagefolder(tmp_path / "data")
    other = create_model("ViT-tiny-test", seed=123)
    sd = params_to_openclip(other.params, other.cfg)
    ck = save_state_dict(sd, str(tmp_path / "other"), "openclip")

    res_other = main(["eval", "--model", "ViT-tiny-test",
                      "--pretrained", ck,
                      "--dataset-root", str(tmp_path / "data"),
                      "--task", "zeroshot_classification",
                      "--batch-size", "4"])
    res_interp = main(["eval", "--model", "ViT-tiny-test",
                       "--interpolate", "--beta", "0.0",
                       "--interpolate-ckpt", ck,
                       "--dataset-root", str(tmp_path / "data"),
                       "--task", "zeroshot_classification",
                       "--batch-size", "4"])
    assert res_interp[0]["metrics"]["acc1"] == res_other[0]["metrics"]["acc1"]


def test_wds_classification_dataset(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "wds"
    os.makedirs(root / "test")
    with tarfile.open(root / "test" / "test-0000.tar", "w") as tf:
        import io
        for i in range(6):
            buf = io.BytesIO()
            _img(rng).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cls = str(i % 2).encode()
            info = tarfile.TarInfo(f"{i:05d}.cls")
            info.size = len(cls)
            tf.addfile(info, io.BytesIO(cls))
    with open(root / "classnames.txt", "w") as f:
        f.write("zero\none\n")

    ds, task, classnames, templates = bld.build_dataset(
        "wds/mytest", str(root), None, batch_size=4)
    assert task == "zeroshot_classification"
    assert classnames == ["zero", "one"]
    batches = list(ds)
    n = sum(len(l) for _, l in batches)
    assert n == 6
    assert set(np.concatenate([l for _, l in batches])) == {0, 1}


def test_image_caption_selection(tmp_path):
    from leaf_tpu.benchmark.image_caption_selection import (
        evaluate_image_caption_selection,
    )
    from leaf_tpu.models import create_model, get_tokenizer

    rng = np.random.default_rng(2)
    os.makedirs(tmp_path / "imgs")
    ann = {}
    for i in range(4):
        fname = f"{i}.png"
        _img(rng).save(tmp_path / "imgs" / fname)
        ann[str(i)] = {"filename": fname,
                       "caption": f"a photo number {i}",
                       "negative_caption": f"an upside down thing {i}"}
    with open(tmp_path / "add_att.json", "w") as f:
        json.dump(ann, f)

    ds = bld.CaptionSelectionDataset(str(tmp_path / "imgs"),
                                     str(tmp_path / "add_att.json"),
                                     None, batch_size=2)
    model = create_model("ViT-tiny-test")
    m = evaluate_image_caption_selection(model.params, model.cfg,
                                         get_tokenizer(), ds)
    assert m["num_samples"] == 4 and 0.0 <= m["acc"] <= 1.0


def test_captioning_metrics_sanity():
    from leaf_tpu.benchmark.captioning import bleu4, cider_d
    cands = ["a cat sits on the mat", "a dog runs in the park"]
    refs = [[c] for c in cands]
    assert bleu4(cands, refs) == pytest.approx(1.0)
    assert cider_d(cands, refs) > 5.0
    worse = bleu4(["completely unrelated words here now"], [refs[0]])
    assert worse < 0.2


def test_captioning_eval_runs(tmp_path):
    import jax

    from leaf_tpu.benchmark.captioning import evaluate_captioning
    from leaf_tpu.models import coca as lcoca
    from leaf_tpu.models.coca import CoCaConfig, MultimodalConfig
    from leaf_tpu.models.config import TextConfig, VisionConfig
    from leaf_tpu.tokenizer import get_tokenizer

    cfg = CoCaConfig(
        name="coca-tiny", embed_dim=64,
        text=TextConfig(context_length=12, vocab_size=49408, width=64,
                        heads=2, layers=2, output_dim=64),
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, head_width=32, output_dim=64),
        multimodal=MultimodalConfig(context_length=12, width=64, heads=2,
                                    layers=2, vocab_size=49408),
        n_queries=8, attn_pooler_heads=2)
    params = lcoca.init_coca(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    dataset = [(images, [["a tiny test image"], ["another test image"]])]
    m = evaluate_captioning(params, cfg, get_tokenizer(), dataset,
                            jax.random.PRNGKey(0), seq_len=6)
    assert m["num_samples"] == 2
    assert np.isfinite(m["bleu4"]) and np.isfinite(m["cider_d"])


def test_build_subcommand(tmp_path):
    from leaf_tpu.benchmark.cli import main
    rows = []
    for i, ds in enumerate(("cifar10", "cifar100")):
        path = tmp_path / f"r{i}.json"
        with open(path, "w") as f:
            json.dump({"model": "m", "pretrained": "p", "task": "t",
                       "dataset": ds, "language": "en",
                       "metrics": {"acc1": 0.5 + i / 10}}, f)
        rows.append(str(path))
    out = tmp_path / "bench.csv"
    main(["build", *rows, "--output", str(out)])
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 3 and "acc1" in lines[0]


def test_linear_probe_fewshot(tmp_path):
    from leaf_tpu.benchmark import evaluate_linear_probe
    from leaf_tpu.data.imagenet import ImageFolderDataset
    from leaf_tpu.models import create_model
    make_imagefolder(tmp_path / "train", per_class=4)
    make_imagefolder(tmp_path / "val", per_class=2)
    model = create_model("ViT-tiny-test")
    from leaf_tpu.models.preprocess import image_transform
    pp = image_transform(model.cfg.vision.image_size, do_normalize=False)
    tr = ImageFolderDataset(str(tmp_path / "train"), pp, batch_size=4)
    te = ImageFolderDataset(str(tmp_path / "val"), pp, batch_size=4)
    m = evaluate_linear_probe(model.params, model.cfg, tr, te, n_classes=2,
                              epochs=5, fewshot_k=2)
    assert m["n_train"] == 4  # 2 classes × k=2


def test_model_collections(tmp_path):
    from leaf_tpu.benchmark.model_collection import (
        MODEL_COLLECTIONS, expand_models, get_model_collection_from_file)

    assert ("ViT-L-14", "openai") in MODEL_COLLECTIONS["openai"]
    # bare name + default pretrained
    assert expand_models(["ViT-B-32"], "ckpt.pt") == [("ViT-B-32", "ckpt.pt")]
    # inline pair
    assert expand_models(["ViT-L-14,fare2"]) == [("ViT-L-14", "fare2")]
    # collection name
    assert expand_models(["openai"]) == MODEL_COLLECTIONS["openai"]
    # openclip_all enumerates the pretrained registry
    allm = expand_models(["openclip_all"])
    assert len(allm) >= 5 and all(len(t) == 2 for t in allm)
    # file format: "model,pretrained" lines with comments
    f = tmp_path / "models.txt"
    f.write_text("# comment\nViT-B-32,laion2b\nRN50,openai\n")
    assert get_model_collection_from_file(str(f)) == [
        ("ViT-B-32", "laion2b"), ("RN50", "openai")]
    assert expand_models([str(f)]) == [("ViT-B-32", "laion2b"),
                                       ("RN50", "openai")]


def test_reformat_subcommand(tmp_path):
    from leaf_tpu.benchmark.cli import main
    files = []
    for i, (ds, acc) in enumerate((("wds/cifar10", 0.81),
                                   ("wds/vtab/flowers", 0.62))):
        path = tmp_path / f"r{i}.json"
        with open(path, "w") as f:
            json.dump({"model": "ViT-B-32", "pretrained": "p", "task": "t",
                       "dataset": ds, "language": "en", "attack": "none",
                       "eps": 2.0, "iterations_adv": 100,
                       "metrics": {"acc1": acc}}, f)
        files.append(str(path))
    merged = tmp_path / "bench.csv"
    main(["build", *files, "--output", str(merged)])
    out = tmp_path / "pivot.csv"
    main(["reformat", str(merged), "--output", str(out)])
    head, row = open(out).read().strip().splitlines()
    # dataset prefixes stripped, one column per dataset, acc1 in %
    assert "cifar10" in head and "flowers" in head and "wds/" not in head
    assert "81.0" in row and "62.0" in row


def _write_fake_cifar10(root):
    """Minimal valid cifar-10-batches-py layout (3 test images)."""
    import pickle
    rng = np.random.default_rng(0)
    d = root / "cifar-10-batches-py"
    d.mkdir(parents=True)
    batch = {b"data": rng.integers(0, 255, (3, 3072), dtype=np.uint8),
             b"labels": [0, 3, 7]}
    with open(d / "test_batch", "wb") as f:
        pickle.dump(batch, f)
    with open(d / "data_batch_1", "wb") as f:
        pickle.dump(batch, f)
    meta = {b"label_names": [n.encode() for n in
                             ("airplane automobile bird cat deer dog frog "
                              "horse ship truck").split()]}
    with open(d / "batches.meta", "wb") as f:
        pickle.dump(meta, f)


def test_torchvision_builder_cifar10(tmp_path):
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    _write_fake_cifar10(tmp_path)
    pre = image_transform(32, do_normalize=False)
    ds, task, classnames, templates = build_dataset(
        "cifar10", str(tmp_path), pre, split="test", batch_size=2)
    assert task == "zeroshot_classification"
    assert classnames[0] == "airplane" and len(classnames) == 10
    batches = list(ds)
    imgs, labels = batches[0]
    assert imgs.shape == (2, 32, 32, 3) and imgs.dtype == np.float32
    assert list(labels) == [0, 3]
    assert sum(len(l) for _, l in batches) == 3


def test_torchvision_builder_missing_data_message(tmp_path):
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    with pytest.raises(FileNotFoundError, match="torchvision-native"):
        build_dataset("food101", str(tmp_path),
                      image_transform(32, do_normalize=False))


def test_imagenet_a_subset_classnames(tmp_path):
    from leaf_tpu.benchmark.builder import (build_dataset,
                                            load_imagenet_wnids)
    from leaf_tpu.models.preprocess import image_transform
    from PIL import Image

    wn = load_imagenet_wnids()
    assert len(wn["all"]) == 1000 and len(wn["imagenet-a"]) == 200
    # fake imagenet-a folder: 3 of the subset's wnid dirs
    for wnid in wn["imagenet-a"][:3]:
        d = tmp_path / wnid
        d.mkdir(parents=True)
        Image.new("RGB", (8, 8)).save(d / "x.jpg")
    ds, task, classnames, templates = build_dataset(
        "imagenet-a", str(tmp_path), image_transform(32, do_normalize=False),
        batch_size=4)
    assert len(classnames) == 3
    # first subset wnid n01498041 is 'stingray' in imagenet1k
    full = json.load(open("leaf_tpu/benchmark/assets/en_classnames.json"))
    idx = wn["all"].index(wn["imagenet-a"][0])
    assert classnames[0] == full["imagenet1k"][idx]


def test_imagenetv2_numeric_dir_order(tmp_path):
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform
    from PIL import Image

    # numeric dirs sort lexically: 0, 10, 2 — classnames must follow
    for c in ("0", "2", "10"):
        d = tmp_path / c
        d.mkdir(parents=True)
        Image.new("RGB", (8, 8)).save(d / "x.jpg")
    ds, task, classnames, _ = build_dataset(
        "imagenetv2", str(tmp_path), image_transform(32, do_normalize=False),
        batch_size=4)
    full = json.load(open(
        "leaf_tpu/benchmark/assets/en_classnames.json"))["imagenet1k"]
    assert ds.classes == ["0", "10", "2"]       # lexical folder order
    assert classnames == [full[0], full[10], full[2]]


def test_native_mnist_builder(tmp_path):
    import gzip
    import struct

    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    rng = np.random.default_rng(0)
    d = tmp_path / "MNIST" / "raw"
    d.mkdir(parents=True)
    imgs = rng.integers(0, 255, (4, 28, 28), dtype=np.uint8)
    labels = np.array([1, 0, 7, 7], np.uint8)
    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">I", 0x00000803) + struct.pack(">III", 4, 28, 28)
                + imgs.tobytes())
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">I", 0x00000801) + struct.pack(">I", 4)
                + labels.tobytes())
    ds, task, classnames, _ = build_dataset(
        "mnist", str(tmp_path), image_transform(28, do_normalize=False),
        batch_size=3)
    assert len(classnames) == 10
    batches = list(ds)
    assert batches[0][0].shape == (3, 28, 28, 3)
    assert list(batches[0][1]) == [1, 0, 7] and list(batches[1][1]) == [7]


def test_native_registry_breadth():
    from leaf_tpu.benchmark.tv_datasets import NATIVE_DATASETS

    expected = {"cifar10", "cifar100", "mnist", "svhn", "stl10", "food101",
                "dtd", "pets", "flowers", "fgvc_aircraft", "gtsrb",
                "eurosat", "country211", "renderedsst2", "sun397",
                "caltech101"}
    assert expected <= set(NATIVE_DATASETS)


def _write_fake_voc(root, ids_objects):
    """ids_objects: {image_id: [(category, box), ...]}"""
    from PIL import Image
    d = root / "VOCdevkit" / "VOC2007"
    (d / "JPEGImages").mkdir(parents=True)
    (d / "Annotations").mkdir()
    (d / "ImageSets" / "Main").mkdir(parents=True)
    with open(d / "ImageSets" / "Main" / "test.txt", "w") as f:
        f.write("\n".join(ids_objects) + "\n")
    for image_id, objs in ids_objects.items():
        Image.new("RGB", (64, 64)).save(d / "JPEGImages" / f"{image_id}.jpg")
        parts = "".join(
            f"<object><name>{c}</name><bndbox><xmin>{b[0]}</xmin>"
            f"<ymin>{b[1]}</ymin><xmax>{b[2]}</xmax><ymax>{b[3]}</ymax>"
            f"</bndbox></object>" for c, b in objs)
        (d / "Annotations" / f"{image_id}.xml").write_text(
            f"<annotation>{parts}</annotation>")


def test_voc2007_builders(tmp_path):
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    _write_fake_voc(tmp_path, {
        "000001": [("dog", (1, 1, 32, 32)), ("person", (10, 10, 50, 50))],
        "000002": [("cat", (2, 2, 40, 40))],
    })
    pre = image_transform(32, do_normalize=False)
    # cropped single-label variant: one sample per bounding box
    ds, task, classnames, _ = build_dataset("voc2007", str(tmp_path), pre,
                                            batch_size=4)
    assert task == "zeroshot_classification"
    assert classnames[:2] == ["aeroplane", "bicycle"]
    imgs, labels = next(iter(ds))
    assert imgs.shape[0] == 3
    assert sorted(labels.tolist()) == [7, 11, 14]   # cat, dog, person

    # multilabel variant: one sample per image, 0/1 vector targets
    ds, _, _, _ = build_dataset("voc2007_multilabel", str(tmp_path), pre,
                                batch_size=4)
    imgs, targets = next(iter(ds))
    assert targets.shape == (2, 20)
    assert targets[0, 11] == 1 and targets[0, 14] == 1 and targets[0, 7] == 0
    assert targets[1, 7] == 1 and targets[1].sum() == 1


def test_average_precision_per_class():
    from leaf_tpu.benchmark.zeroshot_classification import (
        average_precision_per_class)

    scores = np.array([[0.9, 0.1], [0.8, 0.4], [0.1, 0.3], [0.2, 0.2]])
    targets = np.array([[1, 0], [0, 1], [1, 0], [0, 0]])
    ap = average_precision_per_class(scores, targets)
    # class 0: positives ranked 1 and 4 -> (1/1 + 2/4)/2
    assert ap[0] == pytest.approx(0.75)
    # class 1: positive ranked 1 -> 1.0
    assert ap[1] == pytest.approx(1.0)


def test_multilabel_eval_reports_map(tmp_path):
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.benchmark import evaluate_zeroshot_classification
    from leaf_tpu.models import create_model, get_tokenizer
    from leaf_tpu.models.preprocess import image_transform

    _write_fake_voc(tmp_path, {"000001": [("dog", (1, 1, 32, 32))]})
    model = create_model("ViT-tiny-test")
    pre = image_transform(model.cfg.vision.image_size, do_normalize=False)
    ds, task, classnames, templates = build_dataset(
        "voc2007_multilabel", str(tmp_path), pre, batch_size=2)
    m = evaluate_zeroshot_classification(
        model.params, model.cfg, get_tokenizer(), ds, classnames, templates)
    assert "mean_average_precision" in m and 0.0 <= m[
        "mean_average_precision"] <= 1.0


def test_objectnet_builder(tmp_path):
    import json as _json
    from PIL import Image
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    (tmp_path / "mappings").mkdir()
    (tmp_path / "mappings" / "folder_to_objectnet_label.json").write_text(
        _json.dumps({"chair_dir": "Chair", "banana_dir": "Banana",
                     "weird_dir": "Weird Thing"}))
    (tmp_path / "mappings" / "objectnet_to_imagenet_1k.json").write_text(
        _json.dumps({"Chair": "folding chair", "Banana": "banana"}))
    img_root = tmp_path / "objectnet-1.0" / "images"
    for d in ("chair_dir", "banana_dir", "weird_dir"):
        (img_root / d).mkdir(parents=True)
        Image.new("RGB", (8, 8)).save(img_root / d / "x.png")
    ds, task, classnames, _ = build_dataset(
        "objectnet", str(tmp_path),
        image_transform(32, do_normalize=False), batch_size=4)
    # only the imagenet-overlapping classes survive; names lowercased
    assert classnames == ["banana", "chair"]
    imgs, labels = next(iter(ds))
    assert len(labels) == 2 and sorted(labels.tolist()) == [0, 1]


def test_native_pcam_and_fer2013(tmp_path):
    import h5py
    from leaf_tpu.benchmark.builder import build_dataset
    from leaf_tpu.models.preprocess import image_transform

    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "camelyonpatch_level_2_split_test_x.h5",
                   "w") as f:
        f["x"] = rng.integers(0, 255, (3, 96, 96, 3), dtype=np.uint8)
    with h5py.File(tmp_path / "camelyonpatch_level_2_split_test_y.h5",
                   "w") as f:
        f["y"] = np.array([0, 1, 1], np.uint8).reshape(3, 1, 1, 1)
    pre = image_transform(32, do_normalize=False)
    ds, _, classnames, _ = build_dataset("pcam", str(tmp_path), pre,
                                         batch_size=4)
    imgs, labels = next(iter(ds))
    assert imgs.shape == (3, 32, 32, 3) and list(labels) == [0, 1, 1]
    assert len(classnames) == 2

    fer = tmp_path / "fer2013"
    fer.mkdir()
    px = " ".join(["128"] * (48 * 48))
    (fer / "test.csv").write_text(f"emotion,pixels\n3,{px}\n0,{px}\n")
    ds, _, classnames, _ = build_dataset("fer2013", str(tmp_path), pre,
                                         batch_size=4)
    imgs, labels = next(iter(ds))
    assert imgs.shape == (2, 32, 32, 3) and list(labels) == [3, 0]
    assert classnames[3] == "happy"


def _make_retrieval_data(tmp_path, n=4):
    rng = np.random.default_rng(5)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ann = []
    for i in range(n):
        fn = f"{i}.jpg"
        _img(rng).save(img_dir / fn)
        ann.append({"image": fn, "caption": [f"caption one {i}",
                                             f"caption two {i}"]})
    ann_file = tmp_path / "karpathy.json"
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_file


def test_cli_retrieval_task(tmp_path):
    """Regression: the CLI retrieval path iterated a non-iterable
    dataset; it must run end to end over image_batches()."""
    from leaf_tpu.benchmark.cli import main

    img_dir, ann_file = _make_retrieval_data(tmp_path)
    res = main(["eval", "--model", "ViT-tiny-test",
                "--dataset", "mscoco_captions",
                "--dataset-root", str(img_dir),
                "--annotation-file", str(ann_file),
                "--batch-size", "2"])
    m = res[0]["metrics"]
    assert res[0]["task"] == "zeroshot_retrieval"
    assert 0.0 <= m["image_retrieval_recall@1"] <= 1.0 \
        or any("recall" in k for k in m)


def test_cli_captioning_task(tmp_path):
    """Regression: --task captioning must load a CoCa model (not the
    CLIP registry) and feed (images, caption-list) batches."""
    from leaf_tpu.benchmark.cli import main

    img_dir, ann_file = _make_retrieval_data(tmp_path, n=2)
    res = main(["eval", "--model", "coca-tiny-test",
                "--task", "captioning",
                "--dataset", "mscoco_captions",
                "--dataset-root", str(img_dir),
                "--annotation-file", str(ann_file),
                "--batch-size", "2"])
    m = res[0]["metrics"]
    assert m["num_samples"] == 2
    assert np.isfinite(m["bleu4"])
