"""Real-data loaders: IDX MNIST parsing + omics CSV (SURVEY.md §2.1 data paths)."""

import gzip
import struct

import numpy as np
import pytest

from mdbn_tpu.data.loaders import load_mnist_images, load_omics_csv


def write_idx(path, images):
    n, rows, cols = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, rows, cols))
        f.write(images.astype(np.uint8).tobytes())


def test_idx_loader_threshold(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (10, 28, 28)).astype(np.uint8)
    p = str(tmp_path / "imgs.idx")
    write_idx(p, imgs)
    data = load_mnist_images(p)
    assert data.shape == (10, 784)
    assert set(np.unique(data)) <= {0.0, 1.0}
    np.testing.assert_array_equal(data[0], (imgs[0].ravel() / 255.0 > 0.5).astype(np.float32))


def test_idx_loader_gzip_and_sample(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (5, 28, 28)).astype(np.uint8)
    raw = struct.pack(">IIII", 2051, 5, 28, 28) + imgs.tobytes()
    p = str(tmp_path / "imgs.idx.gz")
    with gzip.open(p, "wb") as f:
        f.write(raw)
    data = load_mnist_images(p, binarize="sample", seed=0)
    assert data.shape == (5, 784)
    assert set(np.unique(data)) <= {0.0, 1.0}


def test_idx_loader_bad_magic(tmp_path):
    p = str(tmp_path / "bad.idx")
    with open(p, "wb") as f:
        f.write(struct.pack(">IIII", 1234, 1, 2, 2) + b"\x00" * 4)
    with pytest.raises(ValueError, match="magic"):
        load_mnist_images(p)


def test_missing_file_message():
    with pytest.raises(FileNotFoundError, match="synthetic"):
        load_mnist_images("/nonexistent/mnist.idx")


def test_omics_csv(tmp_path):
    rng = np.random.default_rng(2)
    mat = rng.random((20, 5)).astype(np.float32) * 7 + 3
    p = str(tmp_path / "ge.csv")
    np.savetxt(p, mat, delimiter=",")
    out = load_omics_csv({"ge": p})
    assert out["ge"].shape == (20, 5)
    np.testing.assert_allclose(out["ge"].mean(0), 0, atol=1e-3)
