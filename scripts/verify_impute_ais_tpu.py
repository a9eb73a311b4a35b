"""TPU smoke verification of the round-3 imputation + AIS-anneal
features: run on the real chip (python scripts/verify_impute_ais_tpu.py).
The equivalent CPU-mesh coverage lives in tests/test_sampling.py and
tests/test_ais.py; this script is the on-hardware leg."""
import jax
print("backend:", jax.default_backend())
assert jax.default_backend() == "tpu"
import numpy as np
import jax.numpy as jnp
from mdbn_tpu import MDBN, RBM, MDBNConfig, DBNConfig, RBMConfig
from mdbn_tpu.data.synthetic import mnist_like, tcga_like
from mdbn_tpu.analysis import ais
from mdbn_tpu.analysis.cluster import adjusted_rand_index, kmeans_cluster

# --- AIS anneal knobs on the real TPU: trained c1-shape RBM ---
data = mnist_like(1000, seed=2)
rbm = RBM(RBMConfig(n_visible=784, n_hidden=500, epochs=5, batch_size=20,
                    lr=0.05, seed=0)).train(data)
base = ais.log_likelihood(rbm.params, rbm.cfg, data[:500],
                          key=jax.random.PRNGKey(1), n_chains=128,
                          n_betas=2000)
hard = ais.log_likelihood(rbm.params, rbm.cfg, data[:500],
                          key=jax.random.PRNGKey(1), n_chains=128,
                          n_betas=8000, n_sweeps=4, schedule="sm")
print("AIS uniform 2000x1:", round(base["log_z"], 2), "logw_std", round(base["logw_std"], 2))
print("AIS sm 8000x4     :", round(hard["log_z"], 2), "logw_std", round(hard["logw_std"], 2))
assert np.isfinite(hard["log_z"]) and np.isfinite(hard["mean_log_likelihood"])
# the upgraded anneal must be better-RESOLVED (logw_std is the trust
# signal; single-run log Z comparisons are max-weight-dominated noise)
assert hard["logw_std"] < base["logw_std"]
assert abs(hard["log_z"] - base["log_z"]) < 3 * base["logw_std"]

# --- MDBN imputation on the real TPU ---
mods, labels = tcga_like(180, dims={"ge": 32, "meth": 24, "mirna": 16},
                         seed=7, signal=2.5)
towers = {m: DBNConfig(layer_sizes=[16, 8], visible="gaussian", epochs=40,
                       lr=0.1, gaussian_lr=0.02, batch_size=20, seed=i)
          for i, m in enumerate(mods)}
mdbn = MDBN(MDBNConfig(towers=towers,
                       joint=RBMConfig(n_visible=1, n_hidden=8, epochs=60,
                                       lr=0.2, batch_size=20))).train(mods)
observed = {"ge": mods["ge"], "mirna": mods["mirna"]}
imp = mdbn.impute(observed, n_gibbs=100, seed=0)
x = np.asarray(imp["meth"]); truth = np.asarray(mods["meth"])
mse = float(np.mean((x - truth) ** 2))
shuf = truth[np.random.default_rng(0).permutation(len(truth))]
ratio = mse / float(np.mean((x - shuf) ** 2))
print("impute meth on TPU: mse ratio vs shuffled control =", round(ratio, 3))
assert ratio < 0.95
cp = np.asarray(mdbn.transform_partial(observed, n_gibbs=100, seed=0))
ari = adjusted_rand_index(labels, kmeans_cluster(cp, 3, seed=0)[0])
print("partial-cohort ARI:", round(ari, 3))
assert ari > 0.8
# guard rails
try:
    mdbn.impute(mods); raise SystemExit("expected ValueError")
except ValueError: pass
try:
    mdbn.transform_partial(mods); raise SystemExit("expected ValueError")
except ValueError: pass
print("VERIFY OK")
