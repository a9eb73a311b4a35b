"""Throughput benchmark: CD-1 weight updates/sec per chip (BASELINE.json:2).

Workload = graded config 1: single Bernoulli RBM, CD-1, batch 20, 784 visible
x 500 hidden (the Theano-tutorial default widths the reference descends from,
SURVEY.md §0), MNIST-like binarized data. Baseline = the NumPy oracle (the
CPU-reference stand-in, SURVEY.md §4.1/§6) on this host's CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "updates/s", "vs_baseline": N}
Progress/details go to stderr.
"""

import json
import sys
import time

import numpy as np

N_VISIBLE, N_HIDDEN, BATCH = 784, 500, 20
N_SAMPLES = 6000  # 300 updates per epoch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_oracle(data, cfg, min_seconds=3.0, max_steps=2000) -> float:
    from mdbn_tpu.oracle import OracleRBM

    rbm = OracleRBM(cfg)
    nb = data.shape[0] // cfg.batch_size
    # warmup
    for s in range(3):
        rbm.train_step(data[s * cfg.batch_size : (s + 1) * cfg.batch_size])
    t0 = time.perf_counter()
    steps = 0
    while time.perf_counter() - t0 < min_seconds and steps < max_steps:
        i = steps % nb
        rbm.train_step(data[i * cfg.batch_size : (i + 1) * cfg.batch_size])
        steps += 1
    dt = time.perf_counter() - t0
    ups = steps / dt
    log(f"oracle (CPU reference stand-in): {steps} updates in {dt:.2f}s -> {ups:,.0f} updates/s")
    return ups


def bench_tpu(data, cfg, target_updates=600000) -> float:
    # 600k updates/run (~1s of kernel time): the tunneled runtime's
    # launch+sync latency swings 60-900 ms run to run, so short runs measure
    # the tunnel, not the chip. The oracle baseline likewise times >=3 s of
    # steady-state stepping, so both sides exclude fixed setup.
    import jax
    import jax.numpy as jnp

    from mdbn_tpu.core.state import init_train_state
    from mdbn_tpu.ops.cd_epoch_pallas import make_pallas_train_fn

    nb = data.shape[0] // cfg.batch_size
    n_epochs = max(1, target_updates // nb)
    log(f"TPU fused Pallas kernel: {n_epochs} epochs x {nb} updates in ONE launch "
        f"on {jax.devices()[0]}")
    fn = make_pallas_train_fn(cfg, n_epochs)
    if fn is None:
        raise RuntimeError("workload does not fit the Pallas kernel")
    d = jnp.asarray(data)
    state = init_train_state(cfg)
    state, errs = fn(state, d)  # compile + warmup
    np.asarray(errs)  # host copy = true sync (block_until_ready can return early here)

    rates = []
    for _ in range(5):
        st = init_train_state(cfg)
        t0 = time.perf_counter()
        st, errs = fn(st, d)
        # device->host copy forces a true sync (block_until_ready through the
        # tunneled runtime has been observed to return early)
        errs_host = np.asarray(errs)
        _ = float(np.asarray(st.params.W[0, 0]))
        dt = time.perf_counter() - t0
        rates.append(n_epochs * nb / dt)
        log(f"  run: {n_epochs * nb} updates in {dt:.3f}s -> {n_epochs * nb / dt:,.0f} updates/s "
            f"(errs {errs_host[0]:.4f}->{errs_host[-1]:.4f})")
    return float(np.median(rates))


def main():
    from mdbn_tpu.config import RBMConfig
    from mdbn_tpu.data.synthetic import mnist_like

    cfg = RBMConfig(n_visible=N_VISIBLE, n_hidden=N_HIDDEN, k=1, lr=0.1,
                    batch_size=BATCH, epochs=1, seed=0)
    data = mnist_like(N_SAMPLES, n_features=N_VISIBLE, seed=2)

    oracle_ups = bench_oracle(data, cfg)
    tpu_ups = bench_tpu(data, cfg)

    result = {
        "metric": "CD-1 weight updates/sec per chip (Bernoulli RBM 784x500, batch 20)",
        "value": round(tpu_ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(tpu_ups / oracle_ups, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
