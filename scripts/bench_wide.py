"""Wide-shape throughput: the HBM-state tier ladder (chunk-update middle
tier, fully W-blocked tier) vs the XLA fallback (BENCH_DETAIL.md wide-shape
table). Run on the TPU.

Round 3: 20000x400 f32 runs in the plain full-gradient HBM-state tier under
the hardware-validated raised single-chip budget (the round-2 25.7k/s
design); the CHUNK-UPDATE middle tier covers 128-aligned-H shapes past that
budget (20000x512); 28000x400 f32 and 40000x1000 bf16 (40M params) run in
the fully W-blocked tier. This script measures all four against the XLA
engine.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.ops.cd_epoch_pallas import (chunk_update_streams_velocity,
                                          make_pallas_train_fn,
                                          needs_chunk_update,
                                          needs_w_chunking,
                                          pallas_state_mode)
from mdbn_tpu.train.trainer import _jitted_train_xla_fused


def _timed_run(fn, cfg, data, runs):
    """Median wall-clock of ``runs`` full launches (fresh state each, full
    device->host sync via np.asarray — the tunnel can return early from
    block_until_ready)."""
    ts = []
    errs = None
    for _ in range(runs):
        s = init_train_state(cfg)
        t0 = time.perf_counter()
        s, errs = fn(s, data)
        _ = np.asarray(errs)
        _ = float(np.asarray(s.params.W[0, 0], np.float32))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), np.asarray(errs)


def bench(cfg, n_rows, n_epochs, runs=3, engine="pallas", e_lo=None):
    """Two-point marginal rate: the per-launch fixed cost (tunnel RTT,
    state upload, final sync — ~75-90 ms here, identical for both engines)
    cancels in (t_hi - t_lo) / (E_hi - E_lo), giving the steady-state
    training rate either engine would sustain in a long run."""
    e_lo = max(1, n_epochs // 5) if e_lo is None else e_lo
    data = jax.random.normal(jax.random.PRNGKey(1), (n_rows, cfg.n_visible),
                             jnp.float32).astype(jnp.dtype(cfg.param_dtype))
    nb = n_rows // cfg.batch_size

    def build(E):
        if engine == "pallas":
            fn = make_pallas_train_fn(cfg, E)
            assert fn is not None, "pallas tier rejected this shape"
        else:
            fn = _jitted_train_xla_fused(cfg, E, None, "dp")
        st = init_train_state(cfg)
        s, errs = fn(st, data)  # compile + warmup
        return fn, np.asarray(errs)

    fn_hi, e0 = build(n_epochs)
    fn_lo, _ = build(e_lo)
    t_hi, _ = _timed_run(fn_hi, cfg, data, runs)
    t_lo, _ = _timed_run(fn_lo, cfg, data, runs)
    r = (n_epochs - e_lo) * nb / max(1e-9, t_hi - t_lo)
    e2e = n_epochs * nb / t_hi
    print(f"{cfg.n_visible}x{cfg.n_hidden} {cfg.param_dtype} [{engine}]: "
          f"{r:,.0f} updates/s marginal ({e2e:,.0f} end-to-end incl. "
          f"per-launch overhead; errs {e0[0]:.4f}->{e0[-1]:.4f})", flush=True)
    return r


def main():
    print("backend:", jax.default_backend(), flush=True)
    # graded wide-omics shape: f32, the plain HBM-state tier (raised budget)
    wide = RBMConfig(n_visible=20000, n_hidden=400, visible="gaussian",
                     lr=0.001, batch_size=20, seed=0)
    assert pallas_state_mode(wide) is True and not needs_chunk_update(wide)
    p1 = bench(wide, 400, 100)
    x1 = bench(wide, 400, 10, engine="xla")

    # 128-aligned-H shape past the plain budget: the chunk-update tier
    cu = RBMConfig(n_visible=20000, n_hidden=512, visible="gaussian",
                   lr=0.001, batch_size=20, seed=0)
    assert needs_chunk_update(cu)
    p4 = bench(cu, 400, 100)
    x4 = bench(cu, 400, 10, engine="xla")

    # round 4 (VERDICT r3 #1): learn_variance at the graded wide shape —
    # H-padded chunk-update tier with the chunked z statistic (this exact
    # config measured ~3.7k/s-class on the XLA engine in round 3)
    lv = wide.replace(learn_variance=True)
    assert needs_chunk_update(lv)
    p5 = bench(lv, 400, 60)
    x5 = bench(lv, 400, 10, engine="xla")

    # round 4 (VERDICT r3 #1): Hinton-default momentum at f32 storage — the
    # chunk-update tier with the W velocity streamed through HBM
    mom = wide.replace(momentum=0.5)
    assert chunk_update_streams_velocity(mom)
    p6 = bench(mom, 400, 60)
    x6 = bench(mom, 400, 10, engine="xla")

    # round 5 (VERDICT r4 #6): the measured wide-momentum recommendation —
    # bf16 parameter storage halves the masters, so momentum runs without
    # velocity streaming (either the plain HBM tier or two-master chunk)
    mom16 = wide.replace(momentum=0.5, param_dtype="bfloat16",
                         compute_dtype="bfloat16")
    assert pallas_state_mode(mom16) is True
    assert not chunk_update_streams_velocity(mom16)
    p7 = bench(mom16, 400, 60)
    x7 = bench(mom16, 400, 10, engine="xla")

    # round 5 (VERDICT r4 #7): the enhanced gradient at the graded wide
    # shape — the chunked recombination removed the second W-sized
    # transient, so this routes fused at f32 now
    enh = wide.replace(gradient="enhanced")
    assert needs_chunk_update(enh)
    p8 = bench(enh, 400, 60)
    x8 = bench(enh, 400, 10, engine="xla")

    # round 5 (VERDICT r4 #7): tempering at the wide shape, bf16 regime
    # (f32 is a measured rejection: ladder activations + two W-sized values
    # exceed VMEM — PT.md)
    ptw = wide.replace(persistent=True, pt_temps=3, pt_beta_min=0.3,
                       param_dtype="bfloat16", compute_dtype="bfloat16")
    assert needs_chunk_update(ptw)
    p9 = bench(ptw, 400, 60)
    x9 = bench(ptw, 400, 10, engine="xla")

    # round 5 (code-review follow-up): local batch 64 at the graded wide
    # shape — the realistic per-shard DP batch, previously the one
    # published fused rejection (the chunk tier's W master+read + Gibbs
    # activations overflow at f32 B=64). The wide-offset W-blocked packing
    # (vs lanes at 64) now routes it fused, single-chip and under DP.
    b64 = wide.replace(batch_size=64)
    assert needs_w_chunking(b64) and not needs_chunk_update(b64)
    p10 = bench(b64, 640, 60)
    x10 = bench(b64, 640, 10, engine="xla")

    # beyond the middle tier: 28000x400 f32 runs fully W-blocked
    wider = RBMConfig(n_visible=28000, n_hidden=400, visible="gaussian",
                      lr=0.001, batch_size=20, seed=0)
    assert needs_w_chunking(wider)
    p3 = bench(wider, 400, 20)
    x3 = bench(wider, 400, 10, engine="xla")

    # the 40M-param shape: bf16 W-blocked Pallas vs bf16 XLA fallback
    big_bf16 = RBMConfig(n_visible=40000, n_hidden=1000, visible="gaussian",
                         lr=0.001, batch_size=20, seed=0,
                         param_dtype="bfloat16", compute_dtype="bfloat16")
    assert needs_w_chunking(big_bf16)
    p2 = bench(big_bf16, 200, 20)
    x2 = bench(big_bf16, 200, 10, engine="xla")
    print(f"SUMMARY wide 20000x400 f32 (plain HBM-state): pallas {p1:,.0f}/s "
          f"vs xla {x1:,.0f}/s ({p1 / x1:.1f}x)")
    print(f"SUMMARY 20000x512 f32 (chunk-update): pallas {p4:,.0f}/s "
          f"vs xla {x4:,.0f}/s ({p4 / x4:.1f}x)")
    print(f"SUMMARY 20000x400 f32 learn_variance (chunk-update, H-padded): "
          f"pallas {p5:,.0f}/s vs xla {x5:,.0f}/s ({p5 / x5:.1f}x)")
    print(f"SUMMARY 20000x400 f32 momentum (chunk-update, streamed vW): "
          f"pallas {p6:,.0f}/s vs xla {x6:,.0f}/s ({p6 / x6:.1f}x)")
    print(f"SUMMARY 20000x400 bf16 momentum (two-master, no streaming): "
          f"pallas {p7:,.0f}/s vs xla {x7:,.0f}/s ({p7 / x7:.1f}x)")
    print(f"SUMMARY 20000x400 f32 enhanced (chunked recombination): "
          f"pallas {p8:,.0f}/s vs xla {x8:,.0f}/s ({p8 / x8:.1f}x)")
    print(f"SUMMARY 20000x400 bf16 PT M=3 (chunk-update): "
          f"pallas {p9:,.0f}/s vs xla {x9:,.0f}/s ({p9 / x9:.1f}x)")
    print(f"SUMMARY 20000x400 f32 batch 64 (wide-offset W-blocked): "
          f"pallas {p10:,.0f}/s vs xla {x10:,.0f}/s ({p10 / x10:.1f}x)")
    print(f"SUMMARY 28000x400 f32 (W-blocked): pallas {p3:,.0f}/s "
          f"vs xla {x3:,.0f}/s ({p3 / x3:.1f}x)")
    print(f"SUMMARY 40000x1000 bf16 (W-blocked): pallas {p2:,.0f}/s "
          f"vs xla {x2:,.0f}/s ({p2 / x2:.1f}x)")


if __name__ == "__main__":
    main()
