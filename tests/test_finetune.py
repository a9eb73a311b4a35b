"""Supervised DBN fine-tuning (tutorial-lineage phase 2)."""

import numpy as np
import pytest

from mdbn_tpu.config import DBNConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.dbn import DBN


def test_pretrain_then_finetune_classifies():
    data, labels = mnist_like(1200, n_prototypes=5, seed=3, return_labels=True)
    train_x, train_y = data[:1000], labels[:1000]
    test_x, test_y = data[1000:], labels[1000:]

    cfg = DBNConfig(layer_sizes=[64, 32], visible="bernoulli", epochs=3,
                    batch_size=20, engine="xla", seed=0)
    dbn = DBN(cfg).train(train_x)
    history = dbn.finetune(train_x, train_y, n_classes=5, epochs=15, lr=0.3)
    assert history[-1] < history[0] * 0.5

    pred = np.asarray(dbn.predict(test_x))
    acc = float((pred == test_y).mean())
    assert acc > 0.9, acc


def test_predict_before_finetune_raises():
    cfg = DBNConfig(layer_sizes=[8], epochs=1, batch_size=8, engine="xla")
    data = mnist_like(32, n_features=16, seed=0)
    dbn = DBN(cfg).train(data)
    with pytest.raises(RuntimeError, match="finetune"):
        dbn.predict(data)


def test_mdbn_finetune_classifies():
    from mdbn_tpu.config import MDBNConfig, RBMConfig
    from mdbn_tpu.data.synthetic import tcga_like
    from mdbn_tpu.models.mdbn import MDBN

    mods, labels = tcga_like(n_patients=300, n_clusters=3,
                             dims={"ge": 60, "meth": 30, "mirna": 20},
                             seed=2, signal=2.5)
    # fine-tuning needs real pretraining: an under-trained joint layer emits
    # near-constant codes and the gradients vanish (probed at 2 epochs)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[24, 12], visible="gaussian", epochs=10,
                             batch_size=20, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=16, epochs=10, lr=0.05,
                        batch_size=20, engine="xla"),
    )
    mdbn = MDBN(cfg).train(mods)
    train = {m: v[:240] for m, v in mods.items()}
    test = {m: v[240:] for m, v in mods.items()}
    history = mdbn.finetune(train, labels[:240], n_classes=3, epochs=25, lr=0.5)
    assert history[-1] < history[0] * 0.5
    pred = np.asarray(mdbn.predict(test))
    acc = float((pred == labels[240:]).mean())
    assert acc > 0.9, acc


def test_finetuned_head_survives_save_load(tmp_path):
    """DBN.save/load must round-trip the finetune() softmax head so predict()
    keeps working (previously the head was silently dropped)."""
    data, labels = mnist_like(400, n_prototypes=3, seed=4, return_labels=True)
    cfg = DBNConfig(layer_sizes=[32, 16], epochs=2, batch_size=20,
                    engine="xla", seed=0)
    dbn = DBN(cfg).train(data)
    dbn.finetune(data, labels, n_classes=3, epochs=3, lr=0.3)
    pred_before = np.asarray(dbn.predict(data))

    dbn.save(str(tmp_path / "dbn"))
    dbn2 = DBN.load(str(tmp_path / "dbn"))
    pred_after = np.asarray(dbn2.predict(data))
    np.testing.assert_array_equal(pred_before, pred_after)


def test_mdbn_finetuned_head_survives_save_load(tmp_path):
    from mdbn_tpu.config import MDBNConfig, RBMConfig
    from mdbn_tpu.data.synthetic import tcga_like
    from mdbn_tpu.models.mdbn import MDBN

    mods, labels = tcga_like(n_patients=120, n_clusters=3,
                             dims={"ge": 30, "meth": 20, "mirna": 10}, seed=5)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[12], visible="gaussian", epochs=2,
                             batch_size=20, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=20,
                        engine="xla"))
    mdbn = MDBN(cfg).train(mods)
    mdbn.finetune(mods, labels, n_classes=3, epochs=2, lr=0.3)
    pred_before = np.asarray(mdbn.predict(mods))

    mdbn.save(str(tmp_path / "mdbn"))
    from mdbn_tpu.models.mdbn import MDBN as M2

    mdbn2 = M2.load(str(tmp_path / "mdbn"))
    np.testing.assert_array_equal(pred_before, np.asarray(mdbn2.predict(mods)))
