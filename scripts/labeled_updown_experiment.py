"""Does the COMPLETE 2006 algorithm (labeled up-down) help, and what does
it cost? -> UPDOWN.md (labeled section)

Three legs (house pattern: decisive ground truth small, honest accuracy and
cost at the 2006-architecture scale):

1. EXACT joint likelihood log p(v, y), enumerable labeled DBN, 3 seeds:
   pretrain + label top to convergence, then either (a) labeled up-down for
   E epochs or (b) the matched-compute control of E MORE label-top CD
   epochs. Ground truth via analysis.ais.exact_labeled_dbn_log_likelihood.
2. The 2006 MNIST-shape network (784 -> 500 -> 500 codes, 2000-hidden
   associative label top, 10 classes) on prototype data with planted
   labels: held-out free-energy classification accuracy before/after
   labeled up-down, plus the labeled variational bound on held-out rows
   (label marginalized at the top).
3. Cost at that shape: marginal s/epoch of labeled up-down (two-point warm
   marginal to exclude compile).

Run on the TPU: python scripts/labeled_updown_experiment.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from mdbn_tpu.analysis.ais import exact_labeled_dbn_log_likelihood
from mdbn_tpu.config import DBNConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.labeled import fit_label_top
from mdbn_tpu.train.updown import finetune_updown_labeled


def leg1_exact(n_seeds=3, pre_epochs=60, top_epochs=60, ft_epochs=40):
    """Pretrain + label top to convergence, then labeled up-down vs the
    matched-compute control of MORE label-top CD epochs. All arms exact."""
    print(f"== leg 1: exact joint likelihood (enumerable 16x12x8 labeled "
          f"DBN, 4 classes), pretrain {pre_epochs}, top {top_epochs}, "
          f"fine-tune {ft_epochs} ==")
    rows = []
    for seed in range(n_seeds):
        data, labels = mnist_like(400, n_features=16, n_prototypes=4,
                                  seed=seed, return_labels=True)
        cfg = DBNConfig(layer_sizes=[12, 8], epochs=pre_epochs, lr=0.2,
                        batch_size=20, seed=seed)
        dbn = DBN(cfg).train(data)
        layers = [(r.params, r.cfg) for r in dbn.layers]
        top, _ = fit_label_top(layers, data, labels, 4, n_hidden=10,
                               epochs=top_epochs, lr=0.2, seed=seed)
        ll0 = exact_labeled_dbn_log_likelihood(layers, top, data, labels, 4)

        # (a) labeled up-down
        rec, gen, top_ud, _ = finetune_updown_labeled(
            layers, top, data, labels, 4, epochs=ft_epochs, lr=0.05,
            batch_size=20, seed=seed)
        tuned = [(p, c) for p, (_, c) in zip(rec, layers)]
        ll_ud = exact_labeled_dbn_log_likelihood(tuned, top_ud, data, labels,
                                                 4, gen=gen)

        # (b) matched-compute control: ft_epochs MORE label-top CD epochs
        top_more, _ = fit_label_top(layers, data, labels, 4, n_hidden=10,
                                    epochs=ft_epochs, lr=0.05, seed=seed,
                                    params=top)
        ll_more = exact_labeled_dbn_log_likelihood(layers, top_more, data,
                                                   labels, 4)

        rows.append((ll0, ll_ud, ll_more))
        print(f"  seed {seed}: pretrained {ll0:.3f} -> labeled up-down "
              f"{ll_ud:.3f} (control: +{ft_epochs} top-CD epochs "
              f"{ll_more:.3f})")
    a = np.array(rows)
    print(f"  mean: pretrained {a[:,0].mean():.3f} ± {a[:,0].std():.3f} | "
          f"up-down {a[:,1].mean():.3f} ± {a[:,1].std():.3f} | "
          f"more-top-CD {a[:,2].mean():.3f} ± {a[:,2].std():.3f}")
    return a


def leg2_mnist_shape(seed=0, pre_epochs=15, top_epochs=30, ft_epochs=10):
    """The 2006 MNIST architecture: 784 -> 500 -> 500 stack, 2000-hidden
    label top, 10 classes. Held-out accuracy + labeled bound before/after."""
    from mdbn_tpu.analysis.ais import labeled_dbn_log_likelihood_bound

    print("== leg 2: the 2006 network (784-500-500 + 2000-hidden label top, "
          "10 classes), held-out accuracy and labeled bound ==")
    data, labels = mnist_like(12000, seed=seed, return_labels=True)
    tr_x, te_x = data[:10000], data[10000:]
    tr_y, te_y = labels[:10000], labels[10000:]
    dbn = DBN(DBNConfig(layer_sizes=[500, 500], epochs=pre_epochs, lr=0.1,
                        batch_size=20, seed=seed)).train(tr_x)
    t0 = time.perf_counter()
    dbn.fit_label_top(tr_x, tr_y, 10, n_hidden=2000, epochs=top_epochs,
                      lr=0.05, seed=seed)
    t_top = time.perf_counter() - t0

    def acc(x, y):
        return float(np.mean(np.asarray(dbn.predict_generative(x)) == y))

    a_tr0, a_te0 = acc(tr_x, tr_y), acc(te_x, te_y)
    kw = dict(n_samples=16, n_chains=256, n_betas=4000, schedule="sm")
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = dbn._label_top
    b0 = labeled_dbn_log_likelihood_bound(layers, top, 10, te_x[:512], **kw)

    t0 = time.perf_counter()
    dbn.finetune_updown_labeled(tr_x, tr_y, epochs=ft_epochs, lr=0.005,
                                seed=seed)
    t_ud = time.perf_counter() - t0
    a_tr1, a_te1 = acc(tr_x, tr_y), acc(te_x, te_y)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = dbn._label_top
    b1 = labeled_dbn_log_likelihood_bound(layers, top, 10, te_x[:512],
                                          gen=dbn._gen, **kw)

    print(f"  accuracy train/test: {a_tr0:.4f}/{a_te0:.4f} -> "
          f"{a_tr1:.4f}/{a_te1:.4f}")
    for tag, b in (("pretrained", b0), ("up-down   ", b1)):
        print(f"  {tag}: held-out labeled bound "
              f"{b['mean_log_likelihood_bound']:.2f} "
              f"(mc_std {b['mc_std']:.3f}, logw_std {b['logw_std']:.3f})")
    n_up = (10000 // 20) * ft_epochs
    print(f"  cost: label top {t_top:.1f}s ({top_epochs} ep), labeled "
          f"up-down {t_ud:.1f}s ({ft_epochs} ep, incl. compile; see leg 3 "
          f"for the warm marginal) = {n_up / t_ud:,.0f} updates/s lower "
          f"bound")
    return (a_tr0, a_te0, a_tr1, a_te1), (b0, b1)


def leg3_cost(seed=0):
    print("== leg 3: warm marginal cost at the 2006 shape ==")
    data, labels = mnist_like(2000, seed=seed, return_labels=True)
    dbn = DBN(DBNConfig(layer_sizes=[500, 500], epochs=2, lr=0.1,
                        batch_size=20, seed=seed)).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = fit_label_top(layers, data, labels, 10, n_hidden=2000,
                           epochs=2, lr=0.05, seed=seed)

    def ud(epochs):
        finetune_updown_labeled(layers, top, data, labels, 10, epochs=epochs,
                                lr=0.005, batch_size=20, seed=seed)

    ud(1); ud(3)  # compile both epoch counts
    t0 = time.perf_counter(); ud(1); t1 = time.perf_counter()
    ud(3); t2 = time.perf_counter()
    s = ((t2 - t1) - (t1 - t0)) / 2
    n_updates = 2000 // 20
    print(f"  labeled up-down: {s:.3f} s/epoch "
          f"({n_updates / s:,.0f} updates/s)")
    return s


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    leg1_exact()
    leg2_mnist_shape()
    leg3_cost()
