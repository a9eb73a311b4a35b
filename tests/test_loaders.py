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


# ---------------------------------------------------------------------------
# Round 3 (VERDICT r2 #5/#6): IDX labels, industrial omics CSV ingestion,
# clinical survival records.


def _write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 2049, len(labels)))
        f.write(np.asarray(labels, np.uint8).tobytes())


def test_idx_label_loader(tmp_path):
    from mdbn_tpu.data.loaders import load_mnist_labels

    labels = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.uint8)
    p = str(tmp_path / "labels-idx1-ubyte")
    _write_idx_labels(p, labels)
    out = load_mnist_labels(p)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, labels)


def test_idx_label_loader_gzip_and_errors(tmp_path):
    import gzip as _gz

    from mdbn_tpu.data.loaders import load_mnist_labels

    p = str(tmp_path / "labels.gz")
    with _gz.open(p, "wb") as f:
        f.write(struct.pack(">II", 2049, 3) + bytes([7, 0, 2]))
    np.testing.assert_array_equal(load_mnist_labels(p), [7, 0, 2])
    bad = str(tmp_path / "bad")
    with open(bad, "wb") as f:
        f.write(struct.pack(">II", 2051, 1) + b"\x00")
    with pytest.raises(ValueError, match="magic"):
        load_mnist_labels(bad)
    trunc = str(tmp_path / "trunc")
    with open(trunc, "wb") as f:
        f.write(struct.pack(">II", 2049, 5) + bytes([1, 2]))
    with pytest.raises(ValueError, match="truncated"):
        load_mnist_labels(trunc)


def test_omics_csv_headers_ids_nans(tmp_path):
    """A TCGA-style export: header row, patient-ID column, missing values —
    round-trips under each NaN policy (VERDICT r2 #6)."""
    p = str(tmp_path / "ge.csv")
    with open(p, "w") as f:
        f.write("patient,BRCA1,TP53,EGFR\n")
        f.write("TCGA-01,1.0,2.0,3.0\n")
        f.write("TCGA-02,4.0,NA,6.0\n")
        f.write("TCGA-03,7.0,8.0,9.0\n")
    with pytest.raises(ValueError, match="missing values"):
        load_omics_csv({"ge": p})
    out = load_omics_csv({"ge": p}, nan_policy="drop", zscore_features=False)
    assert out["ge"].shape == (3, 2)  # TP53 column dropped
    np.testing.assert_allclose(out["ge"][:, 0], [1, 4, 7])
    out = load_omics_csv({"ge": p}, nan_policy="impute_mean",
                         zscore_features=False)
    assert out["ge"].shape == (3, 3)
    np.testing.assert_allclose(out["ge"][1, 1], 5.0)  # mean(2, 8)
    out, ids = load_omics_csv({"ge": p}, nan_policy="impute_mean",
                              return_ids=True)
    assert ids == ["TCGA-01", "TCGA-02", "TCGA-03"]


def test_omics_csv_numeric_header_detected_and_overridable(tmp_path):
    """A header whose feature names are all numeric (Entrez gene IDs) must
    not be ingested as a bogus patient row: the conventional ID-column title
    identifies it, and an explicit header= overrides detection both ways."""
    p = str(tmp_path / "ge.csv")
    with open(p, "w") as f:
        f.write("id,1001,7157,7422\n")          # Entrez IDs: numeric header
        f.write("TCGA-01,0.5,1.2,-0.3\n")
        f.write("TCGA-02,0.1,0.2,0.3\n")
    out, ids = load_omics_csv({"ge": p}, zscore_features=False,
                              return_ids=True)
    assert out["ge"].shape == (2, 3) and ids == ["TCGA-01", "TCGA-02"]
    np.testing.assert_allclose(out["ge"][0], [0.5, 1.2, -0.3])
    # an unconventional ID title defeats the heuristic -> header=True fixes it
    p2 = str(tmp_path / "ge2.csv")
    with open(p2, "w") as f:
        f.write("weird_title,1001,7157,7422\n")
        f.write("TCGA-01,0.5,1.2,-0.3\n")
    out = load_omics_csv({"ge": p2}, zscore_features=False, header=True)
    assert out["ge"].shape == (1, 3)
    # header=False forces a headerless read of an ambiguous all-text file
    p3 = str(tmp_path / "ge3.csv")
    with open(p3, "w") as f:
        f.write("P1,1,2\nP2,3,4\n")
    out = load_omics_csv({"ge": p3}, zscore_features=False, header=False)
    assert out["ge"].shape == (2, 2)
    # clinical loader shares the detection: numeric-looking header row with
    # a conventional ID title is not a record
    from mdbn_tpu.data.loaders import load_clinical_csv

    clin = str(tmp_path / "clin.csv")
    with open(clin, "w") as f:
        f.write("id,5,1\nP1,10,1\nP2,20,0\n")   # header cells all numeric
    times, events, cids = load_clinical_csv(clin)
    assert list(cids) == ["P1", "P2"]
    np.testing.assert_allclose(times, [10.0, 20.0])


def test_omics_csv_id_alignment(tmp_path):
    """Two modalities listing the same patients in DIFFERENT row orders are
    re-aligned by ID; a genuinely different cohort raises (strict) unless
    align='intersect'."""
    ge = str(tmp_path / "ge.csv")
    meth = str(tmp_path / "meth.csv")
    with open(ge, "w") as f:
        f.write("id,g1,g2\nP1,1,2\nP2,3,4\nP3,5,6\n")
    with open(meth, "w") as f:  # same cohort, reversed order
        f.write("id,m1\nP3,30\nP2,20\nP1,10\n")
    out, ids = load_omics_csv({"ge": ge, "meth": meth}, zscore_features=False,
                              return_ids=True)
    assert ids == ["P1", "P2", "P3"]
    np.testing.assert_allclose(out["meth"][:, 0], [10, 20, 30])  # re-aligned

    other = str(tmp_path / "other.csv")
    with open(other, "w") as f:
        f.write("id,x\nP1,1\nP9,2\nP3,3\n")
    with pytest.raises(ValueError, match="cohorts differ"):
        load_omics_csv({"ge": ge, "other": other})
    out2, ids2 = load_omics_csv({"ge": ge, "other": other},
                                align="intersect", zscore_features=False,
                                return_ids=True)
    assert ids2 == ["P1", "P3"]
    assert out2["ge"].shape == (2, 2)


def test_omics_csv_headerless_no_ids_count_mismatch(tmp_path):
    """ID-less modalities must at least agree on patient counts."""
    a = str(tmp_path / "a.csv")
    b = str(tmp_path / "b.csv")
    np.savetxt(a, np.ones((4, 3)), delimiter=",")
    np.savetxt(b, np.ones((5, 2)), delimiter=",")
    with pytest.raises(ValueError, match="patient count"):
        load_omics_csv({"a": a, "b": b})


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(r + "\n")
    return str(path)


def test_omics_csv_orientation_explicit(tmp_path):
    """features_rows transposes: patient IDs come from the header, feature
    names from the row-ID column (VERDICT r3 #6 — real TCGA flat exports
    are typically genes x samples)."""
    p = _write_csv(tmp_path / "ge.csv", "gene,P1,P2,P3",
                   ["BRCA1,1.0,2.0,3.0", "TP53,4.0,5.0,6.0"])
    out, ids = load_omics_csv({"ge": p}, zscore_features=False,
                              return_ids=True, orientation="features_rows")
    assert out["ge"].shape == (3, 2) and ids == ["P1", "P2", "P3"]
    np.testing.assert_allclose(out["ge"], [[1, 4], [2, 5], [3, 6]])
    # per-modality dict form + NaN policy applies AFTER orienting (the
    # feature axis is the column axis of the oriented matrix)
    pn = _write_csv(tmp_path / "ge2.csv", "gene,P1,P2,P3",
                    ["BRCA1,1.0,NA,3.0", "TP53,4.0,5.0,6.0"])
    out = load_omics_csv({"ge": pn}, zscore_features=False,
                         orientation={"ge": "features_rows"},
                         nan_policy="drop")
    assert out["ge"].shape == (3, 1)  # BRCA1 feature column dropped
    with pytest.raises(ValueError, match="orientation must be"):
        load_omics_csv({"ge": p}, orientation="sideways")


def test_omics_csv_orientation_auto_cross_modality(tmp_path):
    """auto with no reference cohort: the patient axis is the one whose
    labels are SHARED across modalities — one file patients x features, the
    other genes x samples, detected and aligned by ID."""
    ge = _write_csv(tmp_path / "ge.csv", "id,g1,g2",
                    ["P1,1,2", "P2,3,4", "P3,5,6"])
    meth = _write_csv(tmp_path / "meth.csv", "probe,P3,P2,P1",
                      ["cg01,30,20,10", "cg02,33,22,11"])
    out, ids = load_omics_csv({"ge": ge, "meth": meth},
                              zscore_features=False, return_ids=True)
    assert ids == ["P1", "P2", "P3"]
    assert out["meth"].shape == (3, 2)
    np.testing.assert_allclose(out["meth"][:, 0], [10, 20, 30])  # realigned


def test_omics_csv_orientation_auto_reference(tmp_path):
    """auto with a reference cohort (e.g. the clinical CSV's patients): a
    single transposed modality orients against it; a file sharing labels
    with NEITHER axis raises rather than guessing."""
    ge = _write_csv(tmp_path / "ge.csv", "gene,P1,P2",
                    ["BRCA1,1.0,2.0", "TP53,3.0,4.0"])
    out, ids = load_omics_csv({"ge": ge}, zscore_features=False,
                              return_ids=True, reference_ids=["P1", "P2"])
    assert ids == ["P1", "P2"] and out["ge"].shape == (2, 2)
    with pytest.raises(ValueError, match="neither axis"):
        load_omics_csv({"ge": ge}, reference_ids=["Q1", "Q2"])
    # single modality, no reference: documented patients_rows default
    out = load_omics_csv({"ge": ge}, zscore_features=False)
    assert out["ge"].shape == (2, 2)
    np.testing.assert_allclose(out["ge"][0], [1.0, 2.0])


def test_cli_survival_transposed_omics(tmp_path):
    """End-to-end (VERDICT r3 #6 done-criterion): a TRANSPOSED omics fixture
    (genes x samples) + a patients x features one -> auto-orientation against
    the clinical CSV lent via the data spec -> MDBN -> k-means -> log-rank,
    all aligned by patient ID."""
    import json

    from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig, save_config
    from mdbn_tpu.run import main

    rng = np.random.default_rng(4)
    n = 60
    ids = [f"TCGA-{i:03d}" for i in range(n)]
    ge = tmp_path / "ge.csv"  # genes x samples (transposed), 16 features
    with open(ge, "w") as f:
        f.write("gene," + ",".join(ids) + "\n")
        for j in range(16):
            f.write(f"g{j}," + ",".join(
                f"{v:.4f}" for v in rng.standard_normal(n)) + "\n")
    mirna = tmp_path / "mirna.csv"  # patients x features, shuffled rows
    order = rng.permutation(n)
    with open(mirna, "w") as f:
        f.write("patient," + ",".join(f"m{j}" for j in range(8)) + "\n")
        for i in order:
            f.write(ids[i] + "," + ",".join(
                f"{v:.4f}" for v in rng.standard_normal(8)) + "\n")
    clin = tmp_path / "clinical.csv"
    with open(clin, "w") as f:
        f.write("patient,time,event\n")
        for i in rng.permutation(n):
            f.write(f"{ids[i]},{rng.exponential(2.0):.3f},"
                    f"{int(rng.random() < 0.7)}\n")

    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8], visible="gaussian", epochs=2,
                             batch_size=20, engine="xla", seed=i)
                for i, m in enumerate(["ge", "mirna"])},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=20,
                        engine="xla"))
    save_config({
        "model": cfg,
        "data": {"kind": "omics_csv",
                 "paths": {"ge": str(ge), "mirna": str(mirna)},
                 "zscore": True, "clinical_csv": str(clin)},
        "analysis": {"kmeans": 2,
                     "survival": {"clinical_csv": str(clin)}},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    km = [r for r in recs if r["kind"] == "kmeans"]
    assert km and "logrank" in km[0]
    assert 0.0 <= km[0]["logrank"]["p_value"] <= 1.0


def test_clinical_csv(tmp_path):
    from mdbn_tpu.data.loaders import load_clinical_csv

    p = str(tmp_path / "clin.csv")
    with open(p, "w") as f:
        f.write("patient,time,event\nP2,10.5,1\nP1,3.0,0\nP3,22.0,1\n")
    t, e, ids = load_clinical_csv(p)
    np.testing.assert_allclose(t, [10.5, 3.0, 22.0])
    np.testing.assert_array_equal(e, [1, 0, 1])
    assert ids == ["P2", "P1", "P3"]
    # cohort alignment: reorder to the omics cohort's patient order
    t, e, ids = load_clinical_csv(p, patient_ids=["P1", "P2", "P3"])
    np.testing.assert_allclose(t, [3.0, 10.5, 22.0])
    np.testing.assert_array_equal(e, [0, 1, 1])
    with pytest.raises(ValueError, match="no clinical record"):
        load_clinical_csv(p, patient_ids=["P1", "P7"])


def test_clinical_csv_two_column_and_validation(tmp_path):
    from mdbn_tpu.data.loaders import load_clinical_csv

    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("5.0,1\n2.5,0\n")
    t, e, ids = load_clinical_csv(p)
    assert ids is None
    np.testing.assert_allclose(t, [5.0, 2.5])
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("time,event\n5.0,2\n")
    with pytest.raises(ValueError, match="event must be"):
        load_clinical_csv(bad)
    neg = str(tmp_path / "neg.csv")
    with open(neg, "w") as f:
        f.write("time,event\n-1.0,1\n")
    with pytest.raises(ValueError, match="negative"):
        load_clinical_csv(neg)


def test_cli_survival_from_clinical_csv(tmp_path):
    """End-to-end (VERDICT r2 #5a): omics CSVs with patient IDs -> MDBN ->
    k-means -> log-rank on a REAL clinical (patient_id, time, event) file,
    aligned by ID even though the clinical rows are shuffled."""
    import json

    from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig, save_config
    from mdbn_tpu.run import main

    rng = np.random.default_rng(3)
    n = 60
    ids = [f"TCGA-{i:03d}" for i in range(n)]
    paths = {}
    for name, width in [("ge", 16), ("mirna", 8)]:
        p = tmp_path / f"{name}.csv"
        with open(p, "w") as f:
            f.write("patient," + ",".join(f"f{j}" for j in range(width)) + "\n")
            for i in range(n):
                vals = rng.standard_normal(width)
                f.write(ids[i] + "," + ",".join(f"{v:.4f}" for v in vals) + "\n")
        paths[name] = str(p)
    clin = tmp_path / "clinical.csv"
    order = rng.permutation(n)  # shuffled rows: alignment must fix this
    with open(clin, "w") as f:
        f.write("patient,time,event\n")
        for i in order:
            f.write(f"{ids[i]},{rng.exponential(2.0):.3f},{int(rng.random() < 0.7)}\n")

    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8], visible="gaussian", epochs=2,
                             batch_size=20, engine="xla", seed=i)
                for i, m in enumerate(paths)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=20,
                        engine="xla"))
    save_config({
        "model": cfg,
        "data": {"kind": "omics_csv", "paths": paths, "zscore": True},
        "analysis": {"kmeans": 2,
                     "survival": {"clinical_csv": str(clin)}},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    km = [r for r in recs if r["kind"] == "kmeans"]
    assert km and "logrank" in km[0]
    assert 0.0 <= km[0]["logrank"]["p_value"] <= 1.0


def test_cli_finetune_classifier_from_idx_labels(tmp_path):
    """End-to-end (VERDICT r2 #5b): real IDX image + label files -> DBN
    pretrain -> CLI-driven supervised fine-tune -> accuracy reported."""
    import json

    from mdbn_tpu.config import DBNConfig, save_config
    from mdbn_tpu.run import main

    rng = np.random.default_rng(4)
    # two linearly separable pixel patterns + noise
    n = 120
    labels = rng.integers(0, 2, n).astype(np.uint8)
    base = np.where(labels[:, None] == 1, 200, 40)
    images = (base + rng.integers(0, 40, (n, 64))).clip(0, 255)
    idx = tmp_path / "images-idx3-ubyte"
    _write_idx(idx, images.reshape(n, 8, 8).astype(np.uint8))
    lab = tmp_path / "labels-idx1-ubyte"
    _write_idx_labels(str(lab), labels)

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=5, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_idx", "path": str(idx),
                 "labels_path": str(lab), "binarize": "threshold"},
        "finetune": {"mode": "classifier", "epochs": 40, "lr": 1.0,
                     "n_classes": 2},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "classifier"
    assert ft[0]["train_accuracy"] > 0.9  # separable patterns must be learned


def test_cli_finetune_autoencoder(tmp_path):
    """CLI-driven Hinton-Salakhutdinov autoencoder phase on a DBN."""
    import json

    from mdbn_tpu.config import DBNConfig, save_config
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 120, "n_features": 36},
        "finetune": {"mode": "autoencoder", "epochs": 3, "lr": 1e-3},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["loss_last"] <= ft[0]["loss_first"]


def test_cli_finetune_updown(tmp_path):
    """CLI-driven up-down (wake-sleep) generative fine-tuning on a DBN,
    with the tuned generative weights persisting through --save."""
    import json

    from mdbn_tpu.config import DBNConfig, save_config
    from mdbn_tpu.models.dbn import DBN
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 120, "n_features": 36},
        "finetune": {"mode": "updown", "epochs": 3, "lr": 0.05},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl"),
                 "--save", str(tmp_path / "model")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "updown"
    assert np.isfinite(ft[0]["wake_mse_last"])
    assert hasattr(DBN.load(str(tmp_path / "model")), "_gen")


def test_cli_finetune_label_top(tmp_path):
    """CLI-driven associative label-top RBM (generative classifier) from
    real IDX image+label fixtures, persisting through --save."""
    import json

    from mdbn_tpu.config import DBNConfig, save_config
    from mdbn_tpu.models.dbn import DBN
    from mdbn_tpu.run import main

    rng = np.random.default_rng(5)
    n = 120
    labels = rng.integers(0, 2, n).astype(np.uint8)
    base = np.where(labels[:, None] == 1, 200, 40)
    images = (base + rng.integers(0, 40, (n, 64))).clip(0, 255)
    idx = tmp_path / "images-idx3-ubyte"
    _write_idx(idx, images.reshape(n, 8, 8).astype(np.uint8))
    lab = tmp_path / "labels-idx1-ubyte"
    _write_idx_labels(str(lab), labels)

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=5, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_idx", "path": str(idx),
                 "labels_path": str(lab), "binarize": "threshold"},
        "finetune": {"mode": "label_top", "epochs": 30, "lr": 0.2,
                     "n_classes": 2, "n_hidden": 16},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl"),
                 "--save", str(tmp_path / "model")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "label_top"
    assert ft[0]["train_accuracy"] > 0.9
    assert hasattr(DBN.load(str(tmp_path / "model")), "_label_top")


def test_cli_finetune_updown_labeled(tmp_path):
    """CLI-driven COMPLETE 2006 fine-tuning: 'updown_labeled' fits the label
    top when absent, unties every stack layer, reports accuracy, persists
    through --save — and the AIS block then evaluates the LABELED bound
    (every layer directed, label marginalized at the top)."""
    import json

    from mdbn_tpu.config import DBNConfig, save_config
    from mdbn_tpu.models.dbn import DBN
    from mdbn_tpu.run import main

    rng = np.random.default_rng(6)
    n = 120
    labels = rng.integers(0, 2, n).astype(np.uint8)
    # block-structured classes (class k lights pixel block k, 8% flips):
    # unlike a plain brightness split this gives the stack a non-degenerate
    # code to learn, which the stochastic sleep phase needs — marginal codes
    # from under-pretrained stacks make labeled up-down collapse
    base = np.where((np.arange(64)[None, :] // 32) == labels[:, None], 220, 30)
    flip = rng.random((n, 64)) < 0.08
    images = np.where(flip, 250 - base, base).astype(np.uint8)
    idx = tmp_path / "images-idx3-ubyte"
    _write_idx(idx, images.reshape(n, 8, 8).astype(np.uint8))
    lab = tmp_path / "labels-idx1-ubyte"
    _write_idx_labels(str(lab), labels)

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=30, lr=0.3,
                           batch_size=20, engine="xla", seed=0),
        "data": {"kind": "mnist_idx", "path": str(idx),
                 "labels_path": str(lab), "binarize": "threshold"},
        "finetune": {"mode": "updown_labeled", "epochs": 5, "lr": 0.02,
                     "n_classes": 2, "n_hidden": 16,
                     "label_top_epochs": 30, "label_top_lr": 0.2},
        "analysis": {"ais": True, "ais_samples": 32, "ais_chains": 64,
                     "ais_betas": 300},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl"),
                 "--save", str(tmp_path / "model")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "updown_labeled"
    assert ft[0]["train_accuracy"] > 0.9
    assert np.isfinite(ft[0]["wake_mse_last"])
    aisr = [r for r in recs if r["kind"] == "ais"]
    assert aisr and np.isfinite(aisr[0]["mean_log_likelihood_bound"])
    loaded = DBN.load(str(tmp_path / "model"))
    assert hasattr(loaded, "_label_top")
    assert len(loaded._gen) == 2  # ALL layers untied
