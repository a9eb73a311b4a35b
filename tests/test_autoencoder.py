"""Deep-autoencoder fine-tuning (Hinton & Salakhutdinov 2006): unrolled
encoder/decoder reconstruction backprop after greedy pretraining."""

import numpy as np

from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig
from mdbn_tpu.data.synthetic import mnist_like, tcga_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.models.mdbn import MDBN


def _recon_mse(x, xhat):
    return float(np.mean((np.asarray(x) - np.asarray(xhat)) ** 2))


def test_dbn_autoencoder_improves_reconstruction(tmp_path):
    data = mnist_like(200, n_features=64, seed=1)
    dbn = DBN(DBNConfig(layer_sizes=[32, 16], epochs=3, batch_size=10,
                        engine="xla", seed=0)).train(data)
    before = _recon_mse(data, dbn.reconstruct(data))  # tied W^T decode
    history = dbn.finetune_autoencoder(data, epochs=15, lr=1e-3, batch_size=10)
    after = _recon_mse(data, dbn.reconstruct(data))  # untied tuned decoder
    assert history[-1] < history[0]  # loss decreases
    assert after < before  # fine-tuning beats the pretrained tied decode
    assert hasattr(dbn, "_decoder") and len(dbn._decoder) == 2

    # persistence round-trip keeps the untied decoder
    dbn.save(str(tmp_path / "m"))
    loaded = DBN.load(str(tmp_path / "m"))
    np.testing.assert_allclose(np.asarray(loaded.reconstruct(data)),
                               np.asarray(dbn.reconstruct(data)),
                               rtol=1e-5, atol=1e-6)


def test_dbn_autoencoder_gaussian_bottom():
    mods, _ = tcga_like(n_patients=120, dims={"ge": 32, "meth": 8, "mirna": 8},
                        seed=2)
    dbn = DBN(DBNConfig(layer_sizes=[16, 8], visible="gaussian",
                        gaussian_lr=0.005, epochs=3, batch_size=10,
                        engine="xla", seed=0)).train(mods["ge"])
    history = dbn.finetune_autoencoder(mods["ge"], epochs=10, lr=1e-3,
                                       batch_size=10)
    assert history[-1] < history[0]
    recon = np.asarray(dbn.reconstruct(mods["ge"]))
    assert recon.shape == mods["ge"].shape
    assert np.isfinite(recon).all()
    # gaussian output layer is linear: values must leave [0, 1]
    assert recon.min() < 0 or recon.max() > 1


def test_mdbn_autoencoder(tmp_path):
    mods, _ = tcga_like(n_patients=120, dims={"ge": 24, "meth": 16, "mirna": 8},
                        seed=3)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[12, 6], visible="gaussian",
                             gaussian_lr=0.005, epochs=2, batch_size=10,
                             engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=10,
                        engine="xla"),
    )
    mdbn = MDBN(cfg).train(mods)
    before = sum(_recon_mse(mods[m], r)
                 for m, r in mdbn.reconstruct(mods).items())
    history = mdbn.finetune_autoencoder(mods, epochs=12, lr=1e-3,
                                        batch_size=10)
    recons = mdbn.reconstruct(mods)
    after = sum(_recon_mse(mods[m], r) for m, r in recons.items())
    assert history[-1] < history[0]
    assert after < before
    assert set(recons) == set(mods)
    for m in mods:
        assert recons[m].shape == mods[m].shape

    # codes still come from the (now fine-tuned) encoder; transform works
    codes = np.asarray(mdbn.transform(mods))
    assert np.isfinite(codes).all()

    # persistence round-trip
    mdbn.save(str(tmp_path / "m"))
    loaded = MDBN.load(str(tmp_path / "m"))
    r2 = loaded.reconstruct(mods)
    for m in mods:
        np.testing.assert_allclose(np.asarray(r2[m]), np.asarray(recons[m]),
                                   rtol=1e-5, atol=1e-6)


def test_decoder_resume_and_stale_file_removal(tmp_path):
    import pytest

    data = mnist_like(100, n_features=36, seed=4)
    dbn = DBN(DBNConfig(layer_sizes=[16, 8], epochs=2, batch_size=10,
                        engine="xla", seed=0)).train(data)
    h1 = dbn.finetune_autoencoder(data, epochs=8, lr=1e-3, batch_size=10)
    # resume: the second call must continue from the trained decoder, not
    # re-initialize it from W^T (loss would jump back up)
    h2 = dbn.finetune_autoencoder(data, epochs=3, lr=1e-3, batch_size=10)
    assert h2[0] <= h1[-1] * 1.1

    # stale-decoder removal: re-saving a NON-fine-tuned model into the same
    # directory must not leave the old decoder.npz for load() to pick up
    d = str(tmp_path / "m")
    dbn.save(d)
    fresh = DBN(DBNConfig(layer_sizes=[16, 8], epochs=1, batch_size=10,
                          engine="xla", seed=1)).train(data)
    fresh.save(d)
    loaded = DBN.load(d)
    assert not hasattr(loaded, "_decoder")
    np.testing.assert_allclose(np.asarray(loaded.reconstruct(data[:4])),
                               np.asarray(fresh.reconstruct(data[:4])),
                               rtol=1e-5, atol=1e-6)

    # untrained-model guard
    with pytest.raises(RuntimeError, match="before train"):
        DBN(DBNConfig(layer_sizes=[4])).reconstruct(data)


def test_select_n_clusters_tiny_cohort_error():
    import pytest

    from mdbn_tpu.analysis.cluster import select_n_clusters

    with pytest.raises(ValueError, match="too small"):
        select_n_clusters(np.zeros((2, 4), np.float32), k_min=2, k_max=8)
