"""Wide-shape throughput: the HBM-state / W-blocked Pallas tiers vs the XLA
fallback (BENCH_DETAIL.md wide-shape table). Run on the TPU.

Round 3: honest transient accounting moved 20000x400 f32 into the W-blocked
tier, and bf16 storage + W-blocking admitted 40000x1000 (40M params) into
the fused engine — this script measures both against the XLA engine.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.ops.cd_epoch_pallas import (make_pallas_train_fn,
                                          needs_w_chunking,
                                          pallas_state_mode)
from mdbn_tpu.train.trainer import _jitted_train_xla_fused


def bench(cfg, n_rows, n_epochs, runs=3, engine="pallas"):
    data = jax.random.normal(jax.random.PRNGKey(1), (n_rows, cfg.n_visible),
                             jnp.float32).astype(jnp.dtype(cfg.param_dtype))
    nb = n_rows // cfg.batch_size
    if engine == "pallas":
        fn = make_pallas_train_fn(cfg, n_epochs)
        assert fn is not None, "pallas tier rejected this shape"
    else:
        fn = _jitted_train_xla_fused(cfg, n_epochs, None, "dp")
    st = init_train_state(cfg)
    st2, errs = fn(st, data)  # compile + warmup
    e0 = np.asarray(errs)
    rates = []
    for _ in range(runs):
        s = init_train_state(cfg)
        t0 = time.perf_counter()
        s, errs = fn(s, data)
        _ = np.asarray(errs)
        _ = float(np.asarray(s.params.W[0, 0], np.float32))
        dt = time.perf_counter() - t0
        rates.append(n_epochs * nb / dt)
    r = float(np.median(rates))
    print(f"{cfg.n_visible}x{cfg.n_hidden} {cfg.param_dtype} [{engine}]: "
          f"{r:,.0f} updates/s (errs {e0[0]:.4f}->{e0[-1]:.4f})", flush=True)
    return r


def main():
    print("backend:", jax.default_backend(), flush=True)
    # graded wide-omics shape: f32, now the W-blocked tier
    wide = RBMConfig(n_visible=20000, n_hidden=400, visible="gaussian",
                     lr=0.001, batch_size=20, seed=0)
    assert pallas_state_mode(wide) is True and needs_w_chunking(wide)
    p1 = bench(wide, 400, 40)
    x1 = bench(wide, 400, 3, engine="xla")

    # the 40M-param shape: bf16 W-blocked Pallas vs bf16 XLA fallback
    big_bf16 = RBMConfig(n_visible=40000, n_hidden=1000, visible="gaussian",
                         lr=0.001, batch_size=20, seed=0,
                         param_dtype="bfloat16", compute_dtype="bfloat16")
    assert needs_w_chunking(big_bf16)
    p2 = bench(big_bf16, 200, 20)
    x2 = bench(big_bf16, 200, 2, engine="xla")
    print(f"SUMMARY wide 20000x400 f32: pallas {p1:,.0f}/s vs xla {x1:,.0f}/s "
          f"({p1 / x1:.1f}x)")
    print(f"SUMMARY 40000x1000 bf16: pallas {p2:,.0f}/s vs xla {x2:,.0f}/s "
          f"({p2 / x2:.1f}x)")


if __name__ == "__main__":
    main()
