"""Does up-down fine-tuning help, and what does it cost? -> UPDOWN.md

Three legs (house pattern: decisive ground truth small, honest cost at the
graded shape):

1. EXACT generative likelihood, enumerable DBN, 3 seeds: pretrain to
   convergence, then either (a) up-down for E epochs or (b) the
   matched-compute control of E MORE greedy pretraining epochs. Ground
   truth via analysis.ais.exact_dbn_log_likelihood — no AIS noise in the
   verdict.
2. Variational test-likelihood bound (Salakhutdinov-Murray) at a
   784-visible shape whose top RBM is small enough for AIS to converge,
   held-out rows, before/after up-down.
3. Cost at the graded shape: marginal s/epoch of up-down vs greedy
   pretraining of the same stack (warm two-point marginal to exclude
   compile and fixed per-launch costs).

Run on the TPU: python scripts/updown_experiment.py
"""

import sys
import time

sys.path.insert(0, ".")  # run from the repo root: python scripts/updown_experiment.py

import jax
import numpy as np

from mdbn_tpu.analysis.ais import exact_dbn_log_likelihood
from mdbn_tpu.config import DBNConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.updown import finetune_updown_stack


def leg1_exact(n_seeds=3, pre_epochs=60, ft_epochs=40):
    """Pretrain to convergence, then up-down vs the matched-compute control
    of MORE greedy pretraining. Both arms and the deltas are exact."""
    print(f"== leg 1: exact generative likelihood (enumerable 16x12x8 DBN), "
          f"pretrain {pre_epochs}, fine-tune {ft_epochs} ==")
    rows = []
    for seed in range(n_seeds):
        data = mnist_like(400, n_features=16, n_prototypes=4, seed=seed)
        cfg = DBNConfig(layer_sizes=[12, 8], epochs=pre_epochs, lr=0.2,
                        batch_size=20, seed=seed)
        dbn = DBN(cfg).train(data)
        layers = [(r.params, r.cfg) for r in dbn.layers]
        ll0 = exact_dbn_log_likelihood(layers, data)

        # (a) up-down
        rec, gen, top, _ = finetune_updown_stack(
            layers, data, epochs=ft_epochs, lr=0.05, batch_size=20, seed=seed)
        tuned = [(p, c) for p, (_, c) in zip(rec, layers[:-1])] \
            + [(top, layers[-1][1])]
        ll_ud = exact_dbn_log_likelihood(tuned, data, gen=gen)

        # (b) matched-compute control: ft_epochs MORE pretraining epochs
        cfg2 = DBNConfig(layer_sizes=[12, 8], epochs=pre_epochs + ft_epochs,
                         lr=0.2, batch_size=20, seed=seed)
        dbn2 = DBN(cfg2).train(data)
        ll_more = exact_dbn_log_likelihood(
            [(r.params, r.cfg) for r in dbn2.layers], data)

        rows.append((ll0, ll_ud, ll_more))
        print(f"  seed {seed}: pretrained {ll0:.3f} -> up-down {ll_ud:.3f} "
              f"(control: +{ft_epochs} pretrain epochs {ll_more:.3f})")
    a = np.array(rows)
    print(f"  mean: pretrained {a[:,0].mean():.3f} ± {a[:,0].std():.3f} | "
          f"up-down {a[:,1].mean():.3f} ± {a[:,1].std():.3f} | "
          f"more-pretrain {a[:,2].mean():.3f} ± {a[:,2].std():.3f}")
    return a


def leg2_bound(seed=0, pre_epochs=20, ft_epochs=20):
    """Variational test-likelihood bound at a 784-visible shape with a top
    RBM small enough that AIS converges (AIS.md: betas-first guidance)."""
    from mdbn_tpu.analysis.ais import dbn_log_likelihood_bound

    print("== leg 2: variational bound, 784 x 64 x 32, held-out test rows ==")
    data = mnist_like(2400, seed=seed)
    train, test = data[:2000], data[2000:]
    cfg = DBNConfig(layer_sizes=[64, 32], epochs=pre_epochs, lr=0.1,
                    batch_size=20, seed=seed)
    dbn = DBN(cfg).train(train)
    kw = dict(n_samples=32, n_chains=256, n_betas=4000, schedule="sm")
    layers = [(r.params, r.cfg) for r in dbn.layers]
    before = dbn_log_likelihood_bound(layers, test, **kw)
    dbn.finetune_updown(train, epochs=ft_epochs, lr=0.01)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    after = dbn_log_likelihood_bound(layers, test, gen=dbn._gen, **kw)
    for tag, out in (("pretrained", before), ("up-down   ", after)):
        print(f"  {tag}: bound {out['mean_log_likelihood_bound']:.2f} "
              f"(mc_std {out['mc_std']:.3f}, logw_std {out['logw_std']:.3f})")
    return before, after


def leg3_cost(seed=0):
    print("== leg 3: cost at the graded shape (784 -> 500 -> 500) ==")
    data = mnist_like(2000, seed=seed)
    cfg = DBNConfig(layer_sizes=[500, 500], epochs=2, lr=0.1, batch_size=20,
                    seed=seed)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]

    def marginal(f, e1=1, e2=3):
        """Marginal s/epoch from WARM runs: each epoch count is compiled by
        a throwaway first call (the epoch scan bakes in the count), then the
        two-point difference cancels fixed per-launch costs."""
        f(e1); f(e2)                       # compile both epoch counts
        t0 = time.perf_counter(); f(e1); t1 = time.perf_counter()
        f(e2); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (e2 - e1)

    def ud(epochs):
        finetune_updown_stack(layers, data, epochs=epochs, lr=0.01,
                              batch_size=20, seed=seed)

    def pre(epochs):
        DBN(DBNConfig(layer_sizes=[500, 500], epochs=epochs, lr=0.1,
                      batch_size=20, seed=seed)).train(data)

    ud_s = marginal(ud)
    pre_s = marginal(pre)
    n_updates = (2000 // 20)
    print(f"  up-down: {ud_s:.3f} s/epoch ({n_updates/ud_s:,.0f} updates/s) | "
          f"greedy pretrain (2 layers): {pre_s:.3f} s/epoch")
    return ud_s, pre_s


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    leg1_exact()
    leg2_bound()
    leg3_cost()
