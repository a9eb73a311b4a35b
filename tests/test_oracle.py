"""Oracle self-consistency: the CPU reference stand-in must itself behave like
a correct CD-k RBM (SURVEY.md §4.1/§4.3)."""

import numpy as np
import pytest

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.data.synthetic import bars_and_stripes, mnist_like, tcga_like, zscore
from mdbn_tpu.oracle import OracleDBN, OracleRBM, free_energy


def test_bernoulli_cd1_learns_bars_and_stripes():
    data = bars_and_stripes(512, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=16, k=1, lr=0.3, epochs=30, batch_size=16, seed=0)
    rbm = OracleRBM(cfg).train(data)
    assert rbm.history[-1] < 0.05, rbm.history


def test_bernoulli_cd1_learns_mnist_like():
    data = mnist_like(600, seed=2)
    cfg = RBMConfig(n_visible=784, n_hidden=64, k=1, lr=0.1, epochs=8, batch_size=20, seed=0)
    rbm = OracleRBM(cfg).train(data)
    assert rbm.history[-1] < rbm.history[0] * 0.7, rbm.history


def test_free_energy_gap_grows():
    """Free energy of training data should drop below that of noise as the
    model learns (SURVEY.md §4.3)."""
    data = bars_and_stripes(256, side=4, seed=3)
    rng = np.random.default_rng(0)
    noise = (rng.random((256, 16)) < 0.5).astype(np.float32)
    cfg = RBMConfig(n_visible=16, n_hidden=16, k=1, lr=0.3, epochs=30, batch_size=16)
    rbm = OracleRBM(cfg)
    gap0 = free_energy(rbm.params, noise, "bernoulli").mean() - free_energy(
        rbm.params, data, "bernoulli").mean()
    rbm.train(data)
    gap1 = free_energy(rbm.params, noise, "bernoulli").mean() - free_energy(
        rbm.params, data, "bernoulli").mean()
    assert gap1 > gap0 + 1.0


def test_gaussian_rbm_on_zscored_data():
    mods, _ = tcga_like(n_patients=200, dims={"ge": 100, "meth": 50, "mirna": 30}, seed=4)
    data = mods["ge"]
    cfg = RBMConfig(n_visible=100, n_hidden=32, visible="gaussian", lr=0.005,
                    epochs=10, batch_size=20)
    rbm = OracleRBM(cfg).train(data)
    assert np.isfinite(rbm.history).all()
    assert rbm.history[-1] < rbm.history[0]


def test_pcd_trains():
    data = bars_and_stripes(256, side=4, seed=5)
    cfg = RBMConfig(n_visible=16, n_hidden=16, k=1, persistent=True, lr=0.05,
                    momentum=0.5, l2=1e-4, epochs=15, batch_size=16)
    rbm = OracleRBM(cfg).train(data)
    assert rbm.chain_h is not None and rbm.chain_h.shape == (16, 16)
    assert rbm.history[-1] < rbm.history[0]


def test_dbn_stacks():
    data = mnist_like(300, seed=6)
    cfgs = [RBMConfig(n_visible=784, n_hidden=64, epochs=3, batch_size=20),
            RBMConfig(n_visible=64, n_hidden=32, epochs=3, batch_size=20),
            RBMConfig(n_visible=32, n_hidden=16, epochs=3, batch_size=20)]
    dbn = OracleDBN(cfgs).train(data)
    codes = dbn.transform(data)
    assert codes.shape == (300, 16)
    assert ((codes >= 0) & (codes <= 1)).all()


def test_xent_metric():
    data = bars_and_stripes(128, side=4, seed=7)
    cfg = RBMConfig(n_visible=16, n_hidden=16, error_metric="xent", epochs=8, batch_size=16)
    rbm = OracleRBM(cfg).train(data)
    assert rbm.history[-1] < rbm.history[0]


def test_zscore():
    x = np.random.default_rng(0).random((50, 7)).astype(np.float32) * 10 + 3
    z = zscore(x)
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(z.std(0), 1, atol=1e-3)
