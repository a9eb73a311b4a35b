"""Aux subsystem tests (SURVEY.md §5): profiling, metrics, config validation,
per-layer overrides."""

import json
import os

import numpy as np
import pytest

from mdbn_tpu.config import DBNConfig, RBMConfig, TrainRuntimeConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.trainer import train_rbm
from mdbn_tpu.utils.metrics import MetricsWriter


def test_profile_flag_writes_trace(tmp_path):
    cfg = RBMConfig(n_visible=32, n_hidden=8, epochs=1, batch_size=8, engine="xla")
    data = mnist_like(32, n_features=32, seed=0)
    runtime = TrainRuntimeConfig(profile=True, profile_dir=str(tmp_path / "prof"))
    train_rbm(data, cfg, runtime=runtime)
    files = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path / "prof") for f in fs]
    assert files, "profiler trace directory is empty"


def test_metrics_writer_roundtrip(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsWriter(p) as mw:
        mw.write({"kind": "epoch", "epoch": 0, "err": 0.5})
        mw.write({"kind": "epoch", "epoch": 1, "err": 0.4})
    recs = [json.loads(l) for l in open(p)]
    assert len(recs) == 2 and "ts" in recs[0]
    # None path = no-op
    with MetricsWriter(None) as mw:
        mw.write({"x": 1})


def test_config_validation():
    with pytest.raises(ValueError, match="visible"):
        RBMConfig(n_visible=4, n_hidden=2, visible="laplace")
    with pytest.raises(ValueError, match="error_metric"):
        RBMConfig(n_visible=4, n_hidden=2, error_metric="rmse")
    with pytest.raises(ValueError, match="engine"):
        RBMConfig(n_visible=4, n_hidden=2, engine="cuda")
    with pytest.raises(ValueError, match="k must"):
        RBMConfig(n_visible=4, n_hidden=2, k=0)


def test_dbn_layer_overrides():
    cfg = DBNConfig(
        layer_sizes=[8, 4], visible="gaussian", lr=0.1, gaussian_lr=0.003,
        epochs=2, batch_size=8, engine="xla",
        layer_overrides=[{"k": 2}, {"lr": 0.5, "momentum": 0.9}],
    )
    l0 = cfg.rbm_config(0, 16)
    l1 = cfg.rbm_config(1, 8)
    assert l0.visible == "gaussian" and l0.lr == 0.003 and l0.k == 2
    assert l1.visible == "bernoulli" and l1.lr == 0.5 and l1.momentum == 0.9


def test_dbn_trains_with_overrides():
    data = mnist_like(64, n_features=64, seed=1)
    cfg = DBNConfig(layer_sizes=[16, 8], visible="bernoulli", epochs=2,
                    batch_size=8, engine="xla",
                    layer_overrides=[{}, {"persistent": True, "momentum": 0.5}])
    dbn = DBN(cfg).train(data)
    codes = dbn.transform(data)
    assert codes.shape == (64, 8)
    assert np.isfinite(np.asarray(codes)).all()
