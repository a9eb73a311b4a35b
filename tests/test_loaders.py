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


def _write_idx(path, images):
    """Write an IDX3 image file (the MNIST wire format)."""
    import struct

    n, rows, cols = images.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, rows, cols))
        f.write(images.astype(np.uint8).tobytes())


def test_cli_trains_from_mnist_idx_fixture(tmp_path):
    """End-to-end: the CLI drives a real IDX file through the mnist_idx data
    kind (VERDICT r1 #4: real data wired through the driver)."""
    from mdbn_tpu.config import RBMConfig, save_config
    from mdbn_tpu.run import main

    rng = np.random.default_rng(0)
    images = (rng.random((160, 12, 12)) * 255).astype(np.uint8)
    idx = tmp_path / "images-idx3-ubyte"
    _write_idx(idx, images)

    save_config({
        "model": RBMConfig(n_visible=144, n_hidden=16, epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_idx", "path": str(idx), "binarize": "threshold",
                 "limit": 120},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    import json

    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert [r for r in recs if r["kind"] == "epoch"]


def test_cli_trains_from_omics_csv_fixture(tmp_path):
    """End-to-end: 3 modality CSVs -> MDBN -> k-means via the CLI."""
    from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig, save_config
    from mdbn_tpu.run import main

    rng = np.random.default_rng(1)
    paths = {}
    for name, width in [("ge", 24), ("meth", 16), ("mirna", 8)]:
        p = tmp_path / f"{name}.csv"
        np.savetxt(p, rng.standard_normal((120, width)).astype(np.float32),
                   delimiter=",")
        paths[name] = str(p)

    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8], visible="gaussian", epochs=2,
                             batch_size=20, engine="xla", seed=i)
                for i, m in enumerate(paths)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=20,
                        engine="xla"))
    save_config({
        "model": cfg,
        "data": {"kind": "omics_csv", "paths": paths, "zscore": True},
        "analysis": {"kmeans": 3},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json")]) == 0
