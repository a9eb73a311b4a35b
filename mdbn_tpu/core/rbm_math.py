"""Deterministic JAX core of the RBM: conditionals, energy, CD-k statistics.

This mirrors ``mdbn_tpu.oracle`` (the CPU reference stand-in) exactly — the
unit tests inject identical uniforms into both and require matching gradients
to float32 tolerance (SURVEY.md §4.2). All sampling randomness enters through
the explicit ``uniforms`` pytree, so this module is pure and fully
deterministic; RNG plumbing lives in ``mdbn_tpu.ops.cd_step``.

TPU notes: the three matmuls per Gibbs step are the MXU work; they optionally
run in bfloat16 (``cfg.compute_dtype``) with float32 accumulation via
``preferred_element_type``. Everything else is VPU elementwise work that XLA
fuses around them.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig


class RBMParams(NamedTuple):
    W: jax.Array  # [n_visible, n_hidden]
    b: jax.Array  # [n_visible] visible bias
    c: jax.Array  # [n_hidden] hidden bias
    # [n_visible] log sigma^2 of the Gaussian visible units, present ONLY when
    # cfg.learn_variance (Cho/Krizhevsky GRBM parameterization). None for
    # every fixed-variance model: jax treats a None field as an empty pytree
    # node, so the 3-leaf structure — and every existing checkpoint — is
    # unchanged unless the variance is actually learned.
    z: Optional[jax.Array] = None


def init_params(cfg: RBMConfig, key: jax.Array) -> RBMParams:
    dtype = jnp.dtype(cfg.param_dtype)
    shape = (cfg.n_visible, cfg.n_hidden)
    if cfg.init == "uniform_glorot4":
        # Theano-tutorial lineage: U(+-4*sqrt(6/(nv+nh))) (SURVEY.md §7 #5)
        bound = 4.0 * (6.0 / (cfg.n_visible + cfg.n_hidden)) ** 0.5
        W = jax.random.uniform(key, shape, dtype, -bound, bound)
    else:
        W = cfg.init_scale * jax.random.normal(key, shape, dtype)
    # learned variance starts at sigma^2 = 1 (z = 0): the fixed-variance model
    z = jnp.zeros(cfg.n_visible, dtype) if cfg.learn_variance else None
    return RBMParams(W=W, b=jnp.zeros(cfg.n_visible, dtype),
                     c=jnp.zeros(cfg.n_hidden, dtype), z=z)


def zero_velocity(params: RBMParams) -> RBMParams:
    return RBMParams(*(None if p is None else jnp.zeros_like(p) for p in params))


def inv_sigma2(params: RBMParams) -> Optional[jax.Array]:
    """[V] precision of the Gaussian visible units (None = sigma^2 = 1)."""
    return None if params.z is None else jnp.exp(-params.z.astype(jnp.float32))


def check_fixed_variance_layers(layers, what: str) -> None:
    """Phase-2 algorithms that unroll raw (W, b, c) weights reject
    learned-variance layers loudly rather than silently dropping the
    sigma^2 scaling from the recognition pass. ``layers``: iterable of
    (RBMParams, RBMConfig)."""
    for p, cfg in layers:
        if p.z is not None or cfg.learn_variance:
            raise ValueError(
                f"{what} does not support learn_variance layers (its "
                "unrolled weight stack would silently drop the learned "
                "sigma^2 scaling); pretrain this stack with "
                "learn_variance=False to use it")


def _dot(a: jax.Array, w: jax.Array, compute_dtype,
         matmul_precision: str = "auto") -> jax.Array:
    """Matmul in compute_dtype with f32 accumulation (MXU-friendly).

    When the user asks for float32 compute, "auto"/"highest" request
    Precision.HIGHEST so the TPU MXU does a true-f32 (multi-pass bf16)
    product — required for reconstruction-error parity vs the CPU oracle;
    matmul_precision="fast" selects the one-pass MXU (bf16-grade multiplies)
    for this engine too. compute_dtype="bfloat16" is always the single-pass
    fast path.
    """
    cd = jnp.dtype(compute_dtype)
    precision = (jax.lax.Precision.HIGHEST
                 if cd == jnp.float32 and matmul_precision != "fast"
                 else jax.lax.Precision.DEFAULT)
    return jnp.dot(a.astype(cd), w.astype(cd), precision=precision,
                   preferred_element_type=jnp.float32)


def hidden_mean(params: RBMParams, v: jax.Array, cfg: RBMConfig) -> jax.Array:
    s = inv_sigma2(params)
    vin = v if s is None else v * s
    return jax.nn.sigmoid(_dot(vin, params.W, cfg.compute_dtype, cfg.matmul_precision) + params.c)


def visible_mean(params: RBMParams, h: jax.Array, cfg: RBMConfig) -> jax.Array:
    # learned variance leaves the mean untouched (Cho parameterization:
    # v|h ~ N(b + h W^T, sigma^2) — sigma enters only the noise scale)
    pre = _dot(h, params.W.T, cfg.compute_dtype, cfg.matmul_precision) + params.b
    return jax.nn.sigmoid(pre) if cfg.visible == "bernoulli" else pre


def free_energy(params: RBMParams, v: jax.Array, cfg: RBMConfig) -> jax.Array:
    s = inv_sigma2(params)
    vin = v if s is None else v * s
    pre = _dot(vin, params.W, cfg.compute_dtype, cfg.matmul_precision) + params.c
    softplus = jax.nn.softplus(pre).sum(axis=1)
    if cfg.visible == "bernoulli":
        return -_dot(v, params.b[:, None], cfg.compute_dtype, cfg.matmul_precision)[:, 0] - softplus
    diff = v - params.b
    quad = diff * diff if s is None else diff * diff * s
    return 0.5 * quad.sum(axis=1) - softplus


def recon_error(v0: jax.Array, v1mean: jax.Array, metric: str,
                row_mask: Optional[jax.Array] = None,
                norm: Optional[float] = None) -> jax.Array:
    """Reconstruction-error monitor. With ``row_mask`` ([B, 1] of 0/1) and
    ``norm`` (the effective row count to average over), pad rows are excluded
    — used by uneven DP sharding, where per-shard masked sums scaled by
    1/norm pmean to the exact global-batch mean."""
    masked = row_mask is not None or norm is not None
    n = jnp.float32(norm if norm is not None else v0.shape[0])
    if metric == "mse":
        d = v0 - v1mean
        if row_mask is not None:
            d = d * row_mask
        return jnp.sum(d * d) / (n * v0.shape[1]) if masked else jnp.mean(d * d)
    eps = 1e-7
    p = jnp.clip(v1mean, eps, 1.0 - eps)
    xe = v0 * jnp.log(p) + (1.0 - v0) * jnp.log(1.0 - p)
    if row_mask is not None:
        xe = xe * row_mask
    if masked:
        return -jnp.sum(xe) / n
    return -jnp.mean(jnp.sum(xe, axis=1))


def cd_step_stats(
    params: RBMParams,
    v0: jax.Array,
    chain_h: Optional[jax.Array],
    uniforms: Dict[str, jax.Array],
    cfg: RBMConfig,
    row_mask: Optional[jax.Array] = None,
    norm: Optional[float] = None,
    sparsity_scale: float = 1.0,
) -> Tuple[RBMParams, jax.Array, jax.Array]:
    """One CD-k/PCD step's statistics; mirrors oracle.cd_step_stats.

    Returns (grads, new_chain_h, err). The k-step Gibbs chain is a static
    Python loop (k is a small compile-time constant; unrolling keeps every
    matmul visible to XLA for fusion — no scan overhead for k=1).

    ``row_mask`` ([B, 1] of 0/1) + ``norm`` support uneven DP sharding: pad
    rows are zeroed out of every statistic and sums divide by ``norm``
    (= global_batch / ndev) instead of the local row count, so the pmean of
    per-shard stats is the exact global-batch mean. ``sparsity_scale``
    multiplies the sparsity *target* term (1/ndev under a plain-sum-style
    reduce so the constant enters exactly once; 1 under pmean, where every
    shard contributing the same constant preserves it).
    """
    dtype = v0.dtype
    h0p = hidden_mean(params, v0, cfg)
    h0s = (uniforms["h0"] < h0p).astype(dtype)

    h = chain_h if (cfg.persistent and chain_h is not None) else h0s
    vs = v0
    hmean = h0p
    v1mean = None
    for t in range(cfg.k):
        vmean = visible_mean(params, h, cfg)
        if t == 0:
            v1mean = vmean
        if cfg.visible == "bernoulli":
            vs = (uniforms["v"][t] < vmean).astype(dtype) if cfg.resolved_sample_visible else vmean
        elif cfg.resolved_sample_visible:
            noise = uniforms["noise"][t]
            if params.z is not None:
                noise = noise * jnp.exp(0.5 * params.z)  # N(mean, sigma^2)
            vs = vmean + noise
        else:
            vs = vmean

        hmean = hidden_mean(params, vs, cfg)
        h = (uniforms["h"][t] < hmean).astype(dtype)

    n = jnp.float32(norm if norm is not None else v0.shape[0])
    inv_b = 1.0 / n
    # masking the v side of each outer product zeroes pad rows' contributions
    v_pos = v0 * row_mask if row_mask is not None else v0
    v_neg = vs * row_mask if row_mask is not None else vs
    h_pos = h0p * row_mask if row_mask is not None else h0p
    h_neg = hmean * row_mask if row_mask is not None else hmean
    s = inv_sigma2(params)
    # learned variance: the interaction term couples W to v/sigma^2, so the
    # W/b statistics see precision-scaled visibles (b's own term cancels:
    # <(v-b)/s2>_d - <(vs-b)/s2>_m = (<v> - <vs>)/s2)
    vp = v_pos if s is None else v_pos * s
    vn = v_neg if s is None else v_neg * s
    gW = (_dot(vp.T, h0p, cfg.compute_dtype, cfg.matmul_precision)
          - _dot(vn.T, hmean, cfg.compute_dtype, cfg.matmul_precision)) * inv_b
    gb = jnp.sum(vp - vn, axis=0) * inv_b
    gc = jnp.sum(h_pos - h_neg, axis=0) * inv_b
    gz = None
    if s is not None:
        # d log p / d z_i = e^{-z_i} (<A_i>_data - <A_i>_model),
        # A_i(v, h) = (v_i - b_i)^2 / 2 - v_i (W h)_i  (h Rao-Blackwellized
        # to its conditional mean, like every other statistic here)
        wh_d = _dot(h0p, params.W.T, cfg.compute_dtype, cfg.matmul_precision)
        wh_m = _dot(hmean, params.W.T, cfg.compute_dtype, cfg.matmul_precision)
        A_d = 0.5 * (v0 - params.b) ** 2 - v0 * wh_d
        A_m = 0.5 * (vs - params.b) ** 2 - vs * wh_m
        dA = A_d - A_m
        if row_mask is not None:
            dA = dA * row_mask
        gz = s * jnp.sum(dA, axis=0) * inv_b
        if not cfg.resolved_sample_visible:
            # mean-field negative phase: vs is E[v|h], so (vs-b)^2 misses the
            # conditional's own variance term — E[(v-b)^2] = (mean-b)^2 +
            # sigma^2. Rao-Blackwellize it analytically (s * sigma^2/2 = 1/2
            # per unit, times the effective row fraction under masking);
            # without this the z gradient carries a constant +1/2 bias that
            # inflates sigma without bound.
            frac = (jnp.sum(row_mask) * inv_b if row_mask is not None else 1.0)
            gz = gz - 0.5 * frac
    if cfg.gradient == "enhanced":
        mu = 0.5 * (jnp.sum(v_pos, axis=0) + jnp.sum(v_neg, axis=0)) * inv_b
        lam = 0.5 * (jnp.sum(h_pos, axis=0) + jnp.sum(h_neg, axis=0)) * inv_b
        gW, gb, gc = enhance_grads(gW, gb, gc, mu, lam, cfg)
    if cfg.sparsity_target is not None and cfg.sparsity_cost:
        gc = gc + cfg.sparsity_cost * (
            sparsity_scale * cfg.sparsity_target - jnp.sum(h_pos, axis=0) * inv_b)
    grads = RBMParams(W=gW, b=gb, c=gc, z=gz)
    if cfg.persistent and chain_h is not None:
        v1mean_data = visible_mean(params, h0s, cfg)
    else:
        v1mean_data = v1mean
    metric = cfg.error_metric if cfg.error_metric in ("mse", "xent") else "mse"
    err = recon_error(v0, v1mean_data, metric, row_mask, norm)
    return grads, h, err


def enhance_grads(gW, gb, gc, mu, lam, cfg: Optional[RBMConfig] = None):
    """The enhanced gradient of Cho, Raiko & Ilin (ICML 2011, eqs. 12-14):

        gW_e = <(v-mu)(h-lam)'>_data - <(v-mu)(h-lam)'>_model
             = gW - outer(mu, gc) - outer(gb, lam)       (mu*lam' cancels)
        gb_e = gb - gW_e @ lam
        gc_e = gc - gW_e' @ mu

    with mu/lam the averaged data+model batch means of v/h. A pure
    recombination of the plain sufficient statistics (gW, gb, gc): the update
    direction becomes invariant under bit-flip reparameterizations of the
    units — the centering-trick family's conditioning fix — with no extra
    state and unchanged model semantics. Inputs must be global-batch means
    (under GSPMD dp sharding they are by construction). The matvecs follow
    ``cfg``'s compute/precision policy like every other dot in this engine
    (no cfg: plain jnp defaults, for standalone use)."""
    gW = gW - jnp.outer(mu, gc) - jnp.outer(gb, lam)
    if cfg is None:
        return gW, gb - gW @ lam, gc - gW.T @ mu
    return (gW,
            gb - _dot(gW, lam[:, None], cfg.compute_dtype,
                      cfg.matmul_precision)[:, 0],
            gc - _dot(gW.T, mu[:, None], cfg.compute_dtype,
                      cfg.matmul_precision)[:, 0])


def pt_betas(cfg: RBMConfig) -> jax.Array:
    """The tempering ladder: inverse temperatures linspace(1, pt_beta_min, M).
    Rung 0 is ALWAYS beta=1 (the model), so rung 0's dynamics are exactly the
    plain PCD chain and the negative-phase statistics stay unbiased."""
    return jnp.linspace(1.0, cfg.pt_beta_min, cfg.pt_temps).astype(jnp.float32)


def tempered_log_p_h(params: RBMParams, h: jax.Array, beta,
                     cfg: RBMConfig) -> jax.Array:
    """log p*_beta(h): the EXACT visible-marginal of the tempered joint
    p_beta(v, h) ∝ exp(-beta E(v, h)), up to an h-independent constant.

    Bernoulli: sum_v exp(beta(b.v + c.h + v.Wh)) = exp(beta c.h) *
    prod_i (1 + exp(beta(b + Wh)_i)). Gaussian (sigma=1): integrating the
    v-Gaussian (variance 1/beta) gives beta(c.h + b.Wh + ||Wh||^2/2) plus a
    beta-only constant — constants cancel in swap ratios, so they are
    dropped. Collapsing v makes replica swaps exchange ONLY the h states
    while preserving detailed balance w.r.t. the true marginals.

    ``h``: [..., H]; ``beta`` broadcastable against the leading dims.
    """
    beta = jnp.asarray(beta, jnp.float32)
    hc = _dot(h, params.c[:, None], cfg.compute_dtype, cfg.matmul_precision)[..., 0]
    pre = _dot(h, params.W.T, cfg.compute_dtype, cfg.matmul_precision) + params.b
    if cfg.visible == "bernoulli":
        return beta * hc + jax.nn.softplus(beta[..., None] * pre).sum(-1)
    # gaussian: integrating the tempered v-Gaussian gives per-unit terms
    # (b_i (Wh)_i + (Wh)_i^2 / 2) / sigma_i^2 (sigma = 1 when z is None); the
    # beta-only normalizer is h-independent and cancels in swap ratios
    s = inv_sigma2(params)
    wh = pre - params.b
    bw = params.b if s is None else params.b * s
    sq = wh * wh if s is None else wh * wh * s
    quad = (_dot(wh, bw[:, None], cfg.compute_dtype, cfg.matmul_precision)[..., 0]
            + 0.5 * jnp.sum(sq, axis=-1))
    return beta * (hc + quad)


def _pt_swap_round(params: RBMParams, h: jax.Array, betas: jax.Array,
                   u_swap: jax.Array, parity: int, cfg: RBMConfig) -> jax.Array:
    """One Metropolis replica-swap round over adjacent rungs of one parity.

    Pairs (m, m+1) with m % 2 == parity are disjoint, so they propose
    simultaneously: accept with prob min(1, p*_{bm}(h_{m+1}) p*_{bm+1}(h_m)
    / (p*_{bm}(h_m) p*_{bm+1}(h_{m+1}))), per fantasy particle (row).
    """
    M = h.shape[0]
    lp_self = tempered_log_p_h(params, h, betas[:, None], cfg)          # [M, B]
    lp_up = tempered_log_p_h(params, h[1:], betas[:-1, None], cfg)      # h_{m+1} at beta_m
    lp_dn = tempered_log_p_h(params, h[:-1], betas[1:, None], cfg)      # h_m at beta_{m+1}
    log_a = lp_up + lp_dn - lp_self[:-1] - lp_self[1:]                  # [M-1, B]
    accept = jnp.log(jnp.maximum(u_swap, 1e-38)) < log_a
    rungs = list(h)
    for m in range(parity, M - 1, 2):
        a = accept[m][:, None]
        hm, hm1 = rungs[m], rungs[m + 1]
        rungs[m] = jnp.where(a, hm1, hm)
        rungs[m + 1] = jnp.where(a, hm, hm1)
    return jnp.stack(rungs)


def pt_step_stats(
    params: RBMParams,
    v0: jax.Array,
    chains_h: jax.Array,  # [M, B, n_hidden], rung 0 at beta=1
    uniforms: Dict[str, jax.Array],
    cfg: RBMConfig,
    row_mask: Optional[jax.Array] = None,
    norm: Optional[float] = None,
    sparsity_scale: float = 1.0,
) -> Tuple[RBMParams, jax.Array, jax.Array]:
    """One PT-PCD update's statistics (Desjardins et al. 2010); mirrors
    oracle.pt_step_stats exactly (same injected-uniforms layout).

    Every rung takes ``cfg.k`` collapsed Gibbs sweeps at its own temperature
    (v|h then h|v under p_beta; the Gaussian visible conditional widens to
    variance 1/beta), then an even + an odd replica-swap round couple the
    ladder. Negative-phase statistics come from rung 0 (beta=1 exactly), so
    with pt_temps=1 this IS the plain PCD update for the same draws.
    Returns (grads, new_chains [M, B, H], err).

    ``row_mask`` ([B, 1] of 0/1) + ``norm``: the same uneven-DP-sharding
    contract as ``cd_step_stats`` — each batch row owns its own full ladder
    (the Metropolis swaps are per-particle, so ladders shard with the batch),
    pad rows' statistics are zeroed, and sums divide by ``norm`` so the pmean
    of per-shard stats is the exact global-batch mean. Pad rows' ladders
    still evolve (harmlessly — their states never enter any statistic and
    are sliced off by the caller).
    """
    dtype = v0.dtype
    betas = pt_betas(cfg)                # [M]
    bM = betas[:, None, None]            # [M, 1, 1]
    h0p = hidden_mean(params, v0, cfg)   # positive phase, beta=1
    h0s = (uniforms["h0"] < h0p).astype(dtype)

    s = inv_sigma2(params)
    sigma = None if params.z is None else jnp.exp(0.5 * params.z)
    h = chains_h
    vs = None
    hmean = None
    for t in range(cfg.k):
        pre_v = _dot(h, params.W.T, cfg.compute_dtype, cfg.matmul_precision) + params.b   # [M, B, V]
        if cfg.visible == "bernoulli":
            vmean = jax.nn.sigmoid(bM * pre_v)
            vs = (uniforms["v"][t] < vmean).astype(dtype) if cfg.resolved_sample_visible else vmean
        else:
            # tempered gaussian conditional: mean unchanged, variance
            # sigma^2 / beta (sigma = 1 when the variance isn't learned)
            vmean = pre_v
            if cfg.resolved_sample_visible:
                noise = uniforms["noise"][t] / jnp.sqrt(bM)
                vs = vmean + (noise if sigma is None else noise * sigma)
            else:
                vs = vmean
        vin = vs if s is None else vs * s
        pre_h = _dot(vin, params.W, cfg.compute_dtype, cfg.matmul_precision) + params.c
        hmean = jax.nn.sigmoid(bM * pre_h)
        h = (uniforms["h"][t] < hmean).astype(dtype)

    h = _pt_swap_round(params, h, betas, uniforms["swap"][0], 0, cfg)
    h = _pt_swap_round(params, h, betas, uniforms["swap"][1], 1, cfg)

    inv_b = 1.0 / jnp.float32(norm if norm is not None else v0.shape[0])
    v_pos = v0 * row_mask if row_mask is not None else v0
    v_neg = vs[0] * row_mask if row_mask is not None else vs[0]
    h_pos = h0p * row_mask if row_mask is not None else h0p
    h_neg = hmean[0] * row_mask if row_mask is not None else hmean[0]
    vp = v_pos if s is None else v_pos * s
    vn = v_neg if s is None else v_neg * s
    gW = (_dot(vp.T, h0p, cfg.compute_dtype, cfg.matmul_precision)
          - _dot(vn.T, hmean[0], cfg.compute_dtype, cfg.matmul_precision)) * inv_b
    gb = jnp.sum(vp - vn, axis=0) * inv_b
    gc = jnp.sum(h_pos - h_neg, axis=0) * inv_b
    gz = None
    if s is not None:
        # same z statistic as cd_step_stats, from rung 0 (beta = 1 exactly)
        wh_d = _dot(h0p, params.W.T, cfg.compute_dtype, cfg.matmul_precision)
        wh_m = _dot(hmean[0], params.W.T, cfg.compute_dtype, cfg.matmul_precision)
        A_d = 0.5 * (v0 - params.b) ** 2 - v0 * wh_d
        A_m = 0.5 * (vs[0] - params.b) ** 2 - vs[0] * wh_m
        dA = A_d - A_m
        if row_mask is not None:
            dA = dA * row_mask
        gz = s * jnp.sum(dA, axis=0) * inv_b
        if not cfg.resolved_sample_visible:
            # Rao-Blackwellized mean-field correction (see cd_step_stats);
            # rung 0 runs at beta = 1, so the term is exactly 1/2 (times the
            # effective row fraction under masking)
            frac = (jnp.sum(row_mask) * inv_b if row_mask is not None else 1.0)
            gz = gz - 0.5 * frac
    if cfg.gradient == "enhanced":
        mu = 0.5 * (jnp.sum(v_pos, axis=0) + jnp.sum(v_neg, axis=0)) * inv_b
        lam = 0.5 * (jnp.sum(h_pos, axis=0) + jnp.sum(h_neg, axis=0)) * inv_b
        gW, gb, gc = enhance_grads(gW, gb, gc, mu, lam, cfg)
    if cfg.sparsity_target is not None and cfg.sparsity_cost:
        gc = gc + cfg.sparsity_cost * (
            sparsity_scale * cfg.sparsity_target
            - jnp.sum(h_pos, axis=0) * inv_b)
    grads = RBMParams(W=gW, b=gb, c=gc, z=gz)
    # same monitor convention as the PCD branch of cd_step_stats: the error
    # reconstructs the DATA chain (one step from h0s), not the fantasy chain
    v1mean_data = visible_mean(params, h0s, cfg)
    metric = cfg.error_metric if cfg.error_metric in ("mse", "xent") else "mse"
    err = recon_error(v0, v1mean_data, metric, row_mask, norm)
    return grads, h, err


def pseudo_likelihood(params: RBMParams, v: jax.Array, bit_index,
                      cfg: RBMConfig) -> jax.Array:
    """Theano-tutorial stochastic pseudo-likelihood proxy (Bernoulli visible):
    flip one (rotating) bit per sample; n_visible * mean log sigmoid(FE(flip)
    - FE(v)), negated so the monitor decreases as the model improves."""
    fe = free_energy(params, v, cfg)
    flip_col = jax.nn.one_hot(bit_index, v.shape[1], dtype=v.dtype)
    v_flip = v * (1 - flip_col) + (1 - v) * flip_col
    fe_flip = free_energy(params, v_flip, cfg)
    n = jnp.asarray(v.shape[1], jnp.float32)
    return -jnp.mean(n * -jax.nn.softplus(-(fe_flip - fe)))


def resolve_momentum(cfg: RBMConfig, epoch) -> jax.Array:
    """Hinton-guide schedule: initial_momentum until momentum_switch_epoch.
    ``epoch`` may be traced (used inside jitted epoch loops)."""
    if cfg.initial_momentum is None:
        return jnp.float32(cfg.momentum)
    return jnp.where(epoch < cfg.momentum_switch_epoch,
                     jnp.float32(cfg.initial_momentum), jnp.float32(cfg.momentum))


def apply_update(
    params: RBMParams, velocity: RBMParams, grads: RBMParams, cfg: RBMConfig,
    epoch=0,
) -> Tuple[RBMParams, RBMParams]:
    """vel = m*vel + lr*(grad - l2*W) (decay on W only); param += vel.

    The learned-variance parameter z (when present) follows the same momentum
    rule at ``cfg.lr_variance`` (default: cfg.lr) with no weight decay."""
    if cfg.grad_clip is not None:
        clip = cfg.grad_clip
        grads = RBMParams(*(None if g is None else jnp.clip(g, -clip, clip)
                            for g in grads))
    gW = grads.W - cfg.l2 * params.W if cfg.l2 else grads.W
    m = resolve_momentum(cfg, epoch)
    # velocities stay in the storage dtype (f32 grads are accumulated in f32
    # first, then rounded once — matters for param_dtype="bfloat16" storage)
    vz = pz = None
    if grads.z is not None:
        lr_z = cfg.lr if cfg.lr_variance is None else cfg.lr_variance
        vz = (m * velocity.z.astype(jnp.float32)
              + lr_z * grads.z).astype(velocity.z.dtype)
        pz = params.z + vz.astype(params.z.dtype)
    new_vel = RBMParams(
        W=(m * velocity.W.astype(jnp.float32) + cfg.lr * gW).astype(velocity.W.dtype),
        b=(m * velocity.b.astype(jnp.float32) + cfg.lr * grads.b).astype(velocity.b.dtype),
        c=(m * velocity.c.astype(jnp.float32) + cfg.lr * grads.c).astype(velocity.c.dtype),
        z=vz,
    )
    new_params = RBMParams(
        W=params.W + new_vel.W.astype(params.W.dtype),
        b=params.b + new_vel.b.astype(params.b.dtype),
        c=params.c + new_vel.c.astype(params.c.dtype),
        z=pz,
    )
    return new_params, new_vel
