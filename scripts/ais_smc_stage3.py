"""Stage-3 SMC bracket at the c1 scale: the resample-threshold sweep at the
round-3 best budget (4096 chains, sm 64k x 4 sweeps). Stage-2 measured that
aggressive resampling (ess 0.5/0.7) trades the plain estimator's lucky-chain
upside — which is exactly what a LOWER bound wants — for variance; this
stage measures the light-touch end plus the plain control on one tree.

(The 1M-transition single-dispatch variant crashes the axon tunnel at ~6min
kernel runtime — anneals stay <= 256k transitions per dispatch.)
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

from ais_bracket_at_scale import run
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.rbm import RBM


def main():
    print("backend:", jax.default_backend(), flush=True)
    data = mnist_like(2000, seed=2)
    model = RBM(RBMConfig(n_visible=784, n_hidden=500, k=1, lr=0.05,
                          epochs=15, batch_size=20, seed=0)).train(data)
    print("\n| chains | init | schedule | betas | sweeps | transitions "
          "| log Z lower | log Z upper | gap | ESS fwd | resamples | sec |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    rows = [
        (4096, "sm", 64_000, 4, 0.0),    # plain control (round-3 best row)
        (4096, "sm", 64_000, 4, 0.1),    # light-touch SMC
        (4096, "sm", 64_000, 4, 0.25),
    ]
    for n_chains, schedule, n_betas, n_sweeps, ress in rows:
        print(f"| {n_chains} ", end="", flush=True)
        run(model, data, n_chains, n_betas, n_sweeps, schedule, "resample",
            resample_ess=ress)


if __name__ == "__main__":
    main()
