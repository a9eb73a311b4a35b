"""Parallel-tempering PCD (Desjardins et al. 2010): exact oracle parity,
PCD-equivalence at one rung, mode-mixing where plain Gibbs stalls, e2e
training, config/engine guards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu import oracle
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams, cd_step_stats, pt_step_stats
from mdbn_tpu.data.synthetic import bars_and_stripes
from mdbn_tpu.models.rbm import RBM
from mdbn_tpu.ops.cd_step import draw_pt_uniforms


def _params(V, H, scale, seed):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((V, H)).astype(np.float32) * scale
    b = rng.standard_normal(V).astype(np.float32) * 0.2
    c = rng.standard_normal(H).astype(np.float32) * 0.2
    return (RBMParams(W=jnp.asarray(W), b=jnp.asarray(b), c=jnp.asarray(c)),
            {"W": W, "b": b, "c": c})


def _np_uniforms(cfg, batch, rng):
    """oracle-side draw with the draw_pt_uniforms layout."""
    M = cfg.pt_temps
    u = {
        "h0": rng.random((batch, cfg.n_hidden), dtype=np.float32),
        "v": rng.random((cfg.k, M, batch, cfg.n_visible), dtype=np.float32),
        "h": rng.random((cfg.k, M, batch, cfg.n_hidden), dtype=np.float32),
        "swap": rng.random((2, M - 1, batch), dtype=np.float32),
    }
    if cfg.visible == "gaussian" and cfg.resolved_sample_visible:
        u["noise"] = rng.standard_normal((cfg.k, M, batch, cfg.n_visible)).astype(np.float32)
    return u


@pytest.mark.parametrize("visible,k", [("bernoulli", 1), ("bernoulli", 3),
                                       ("gaussian", 2)])
def test_pt_step_matches_oracle_exactly(visible, k):
    """Identical injected uniforms -> identical grads/chains/err between the
    NumPy oracle and the JAX core (SURVEY.md §4.2 pattern, extended to PT)."""
    V, H, B, M = 14, 9, 6, 4
    jp, npp = _params(V, H, 0.6, seed=0)
    rng = np.random.default_rng(1)
    cfg = RBMConfig(n_visible=V, n_hidden=H, visible=visible, k=k,
                    persistent=True, pt_temps=M, pt_beta_min=0.1,
                    sample_visible=True, engine="xla")
    if visible == "bernoulli":
        v0 = (rng.random((B, V)) < 0.4).astype(np.float32)
        chains = (rng.random((M, B, H)) < 0.5).astype(np.float32)
    else:
        v0 = rng.standard_normal((B, V)).astype(np.float32)
        chains = (rng.random((M, B, H)) < 0.5).astype(np.float32)
    u = _np_uniforms(cfg, B, rng)

    og, ochain, oerr = oracle.pt_step_stats(npp, v0, chains, u, cfg)
    jg, jchain, jerr = pt_step_stats(jp, jnp.asarray(v0), jnp.asarray(chains),
                                     {kk: jnp.asarray(vv) for kk, vv in u.items()},
                                     cfg)
    np.testing.assert_allclose(np.asarray(jg.W), og["W"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.b), og["b"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.c), og["c"], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(jchain), ochain)
    np.testing.assert_allclose(float(jerr), oerr, rtol=1e-5)


def test_pt_single_rung_is_plain_pcd():
    """pt_temps=1 (no hot rungs, no swaps) must reproduce the PCD update
    bit-for-bit given the same draws — rung 0 IS the PCD chain."""
    V, H, B = 10, 7, 5
    jp, _ = _params(V, H, 0.5, seed=2)
    rng = np.random.default_rng(3)
    cfg = RBMConfig(n_visible=V, n_hidden=H, k=2, persistent=True,
                    engine="xla")
    v0 = jnp.asarray((rng.random((B, V)) < 0.4).astype(np.float32))
    chain = jnp.asarray((rng.random((B, H)) < 0.5).astype(np.float32))
    u_cd = {
        "h0": rng.random((B, H), dtype=np.float32),
        "v": rng.random((cfg.k, B, V), dtype=np.float32),
        "h": rng.random((cfg.k, B, H), dtype=np.float32),
    }
    u_pt = {"h0": u_cd["h0"], "v": u_cd["v"][:, None], "h": u_cd["h"][:, None],
            "swap": np.zeros((2, 0, B), np.float32)}
    g1, c1, e1 = cd_step_stats(jp, v0, chain,
                               {kk: jnp.asarray(vv) for kk, vv in u_cd.items()}, cfg)
    g2, c2, e2 = pt_step_stats(jp, v0, chain[None],
                               {kk: jnp.asarray(vv) for kk, vv in u_pt.items()},
                               cfg)
    np.testing.assert_array_equal(np.asarray(g1.W), np.asarray(g2.W))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2[0]))
    np.testing.assert_allclose(float(e1), float(e2))


def _bimodal_params(w=4.0):
    """Two hidden units wired to opposite visible patterns: h=(1,0) and
    h=(0,1) are deep, well-separated modes; plain Gibbs at beta=1 rarely
    crosses, hot rungs cross freely."""
    V = 12
    col = np.ones(V, np.float32)
    col[V // 2:] = -1.0
    W = np.stack([w * col, -w * col], axis=1)  # [V, 2]
    return RBMParams(W=jnp.asarray(W), b=jnp.zeros(V, jnp.float32),
                     c=jnp.zeros(2, jnp.float32))


def _mode_track(params, cfg, n_steps, seed):
    """Run n_steps of pt_step_stats with FIXED params; return rung-0 mode ids
    (+1 for h=(1,0), -1 for (0,1), 0 transitional) per step, batch row 0."""
    B, M = 8, cfg.pt_temps
    key = jax.random.PRNGKey(seed)
    v0 = jnp.zeros((B, cfg.n_visible), jnp.float32)  # grads unused
    chains = jnp.zeros((M, B, cfg.n_hidden), jnp.float32)
    chains = chains.at[:, :, 0].set(1.0)  # start every rung in mode +1
    modes = []
    for t in range(n_steps):
        key, k = jax.random.split(key)
        _, chains, _ = pt_step_stats(params, v0, chains,
                                     draw_pt_uniforms(cfg, B, k), cfg)
        h = np.asarray(chains[0])
        modes.append(np.where(h[:, 0] > h[:, 1], 1,
                              np.where(h[:, 1] > h[:, 0], -1, 0)))
    return np.stack(modes)  # [T, B]


def _switches(modes):
    """Mode flips per chain, ignoring transitional (0) steps."""
    total = 0
    for b in range(modes.shape[1]):
        m = modes[:, b]
        m = m[m != 0]
        total += int(np.sum(m[1:] != m[:-1]))
    return total


def test_pt_mixes_across_modes_where_plain_gibbs_stalls():
    params = _bimodal_params(w=4.0)
    base = dict(n_visible=12, n_hidden=2, persistent=True, engine="xla")
    plain = RBMConfig(**base)  # pt_temps=1: rung 0 alone = plain PCD Gibbs
    pt = RBMConfig(**base, pt_temps=6, pt_beta_min=0.0)
    m_plain = _mode_track(params, plain, 300, seed=0)
    m_pt = _mode_track(params, pt, 300, seed=0)
    s_plain, s_pt = _switches(m_plain), _switches(m_pt)
    # plain Gibbs is trapped in the start mode; tempered swaps cross freely
    assert s_pt > 5 * max(s_plain, 1), (s_plain, s_pt)
    frac_minus = np.mean(m_pt == -1)
    assert 0.2 < frac_minus < 0.8, frac_minus  # PT visits BOTH modes
    assert np.mean(m_plain == -1) < 0.05  # the control really is stuck


def test_pt_training_e2e_and_engine():
    """PT-PCD trains through the public RBM API on the XLA engine, the error
    decreases, and the tempered chain state round-trips a checkpoint."""
    data = bars_and_stripes(256, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=0.2, epochs=20,
                    batch_size=16, persistent=True, pt_temps=5,
                    pt_beta_min=0.0, engine="auto", seed=0)
    rbm = RBM(cfg)
    rbm.train(data)
    assert rbm.metrics.engine == "xla"
    assert rbm.history[-1] < rbm.history[0] * 0.8
    assert rbm.state.chain_h.shape == (5 * 16, 12)

    from mdbn_tpu.checkpoint import restore_state, save_state
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        save_state(rbm.state, os.path.join(d, "ck"))
        restored = restore_state(os.path.join(d, "ck"))
    np.testing.assert_array_equal(np.asarray(restored.chain_h),
                                  np.asarray(rbm.state.chain_h))


def test_pt_composes_with_dbn_and_mdbn():
    """PT reaches stacked models: a DBN layer opts in via layer_overrides,
    and the MDBN joint RBM opts in via its RBMConfig — both train and the
    JSON config round-trips the knobs."""
    import tempfile, os
    from mdbn_tpu.config import DBNConfig, MDBNConfig, load_config, save_config
    from mdbn_tpu.data.synthetic import tcga_like
    from mdbn_tpu.models.dbn import DBN
    from mdbn_tpu.models.mdbn import MDBN

    data = bars_and_stripes(128, side=4, seed=0)
    dcfg = DBNConfig(layer_sizes=[10, 6], epochs=2, batch_size=16,
                     engine="xla", seed=0,
                     layer_overrides=[{"persistent": True, "pt_temps": 4}])
    dbn = DBN(dcfg).train(data)
    assert dbn.layers[0].cfg.pt_temps == 4
    assert dbn.layers[0].state.chain_h.shape == (4 * 16, 10)
    assert dbn.layers[1].cfg.pt_temps == 1

    mods, _ = tcga_like(48, dims={"ge": 12, "meth": 8, "mirna": 6}, seed=0)
    mcfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[6], visible="gaussian", epochs=1,
                             batch_size=8, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=4, epochs=2, batch_size=8,
                        persistent=True, pt_temps=3, engine="xla"))
    mdbn = MDBN(mcfg).train(mods)
    assert np.asarray(mdbn.transform(mods)).shape == (48, 4)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cfg.json")
        save_config(mcfg, p)
        assert load_config(p).joint.pt_temps == 3


def test_pt_config_and_engine_guards():
    with pytest.raises(ValueError, match="persistent"):
        RBMConfig(n_visible=4, n_hidden=2, pt_temps=3)
    with pytest.raises(ValueError, match="pt_beta_min"):
        RBMConfig(n_visible=4, n_hidden=2, persistent=True, pt_temps=3,
                  pt_beta_min=1.5)
    with pytest.raises(ValueError, match="pt_temps"):
        RBMConfig(n_visible=4, n_hidden=2, pt_temps=0)
    # engine='pallas' + PT is now a real fused path (test_pallas_pt.py); on
    # the CPU backend it still refuses the zero-bits interpreter like every
    # pallas config
    with pytest.raises(ValueError, match="interpreter"):
        RBM(RBMConfig(n_visible=16, n_hidden=4, persistent=True, pt_temps=3,
                      engine="pallas", batch_size=8, epochs=1)).train(
            bars_and_stripes(32, side=4, seed=0))
    # PT on a multi-device mesh is supported since round 4 (VERDICT r3 #4):
    # the GSPMD engine replicates the rung-major ladder and shards the data
    # (exact-parity tests live in test_distributed/test_pallas_dp)
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:2])
    if devs.size >= 2:
        from mdbn_tpu.train.trainer import train_rbm
        st, m = train_rbm(bars_and_stripes(32, side=4, seed=0),
                          RBMConfig(n_visible=16, n_hidden=4, persistent=True,
                                    pt_temps=3, batch_size=8, epochs=1,
                                    engine="xla"),
                          mesh=Mesh(devs, ("dp",)))
        assert st.chain_h.shape == (3 * 8, 4)
        assert np.isfinite(m.errors).all()


def test_oracle_rbm_train_step_dispatches_pt():
    """OracleRBM under pt_temps>1 must run the tempered ladder, not plain PCD
    (round-5 regression: the dispatch was missing, so the parity harness's
    PT row compared the tpu's PT against a plain-PCD oracle — different
    algorithms, systematically different final errors)."""
    cfg = RBMConfig(n_visible=8, n_hidden=6, k=1, lr=0.1, epochs=1,
                    batch_size=4, persistent=True, pt_temps=3,
                    pt_beta_min=0.2, seed=0)
    rng = np.random.default_rng(1)
    v0 = (rng.random((4, 8)) < 0.5).astype(np.float32)
    u = oracle.draw_pt_uniforms(cfg, 4, np.random.default_rng(2))

    o = oracle.OracleRBM(cfg)
    params0 = {k: v.copy() for k, v in o.params.items()}
    err = o.train_step(v0, uniforms=u)
    # the persistent state is the full [M, B, H] ladder
    assert o.chain_h.shape == (3, 4, 6)

    # and it is exactly one pt_step_stats application from zeros
    chains0 = np.zeros((3, 4, 6), np.float32)
    grads, chain_ref, err_ref = oracle.pt_step_stats(params0, v0, chains0, u, cfg)
    np.testing.assert_allclose(o.chain_h, chain_ref, rtol=0, atol=0)
    assert err == pytest.approx(err_ref)
    # the update itself used the PT gradient: W moved by lr * gW (no momentum
    # on step 1 beyond velocity init at zero, l2 = 0 by default here)
    np.testing.assert_allclose(o.params["W"] - params0["W"],
                               cfg.lr * grads["W"], rtol=1e-6, atol=1e-7)
