"""Stage-2 SMC bracket runs at the c1 scale: combine the ESS fix (SMC
resampling, round 4) with the chain/sweep budget that round 3 measured as
the gap's real lever. Reuses ais_bracket_at_scale's harness."""

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
        (2048, "sm", 64_000, 1, 0.5),
        (1024, "sm", 64_000, 4, 0.5),
        (4096, "sm", 64_000, 4, 0.5),
        (2048, "sm", 64_000, 4, 0.7),
    ]
    for n_chains, schedule, n_betas, n_sweeps, ress in rows:
        print(f"| {n_chains} ", end="", flush=True)
        run(model, data, n_chains, n_betas, n_sweeps, schedule, "resample",
            resample_ess=ress)


if __name__ == "__main__":
    main()
