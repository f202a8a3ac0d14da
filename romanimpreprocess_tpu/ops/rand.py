"""Fast branch-free Poisson sampling for TPU.

``jax.random.poisson`` costs ~3.6 ns/sample on v5e (per-sample rejection
with while-loop control flow) — ~850 ms per full-frame exposure draw,
85% of the L1 synthesis budget.  This sampler is fixed-trip-count and
fully vectorized:

- lam <= 10: exact inverse-CDF by a fixed 40-step recurrence
  (P(X > 40 | lam <= 10) < 1e-13), pure fused multiply-adds;
- lam > 10: Hormann's PTRS transformed rejection with a fixed number of
  unrolled rounds (acceptance ~0.94/round, 6 rounds leave < 1e-7
  unfilled), falling back to a moment-matched rounded normal for any
  straggler lane.

Both branches evaluate masked-dense (no data-dependent control flow);
distribution-exactness is tested against the scipy pmf.
"""

import functools

import jax
import jax.numpy as jnp

def sim_key(seed):
    """PRNG key for bulk simulation draws.

    The ``rbg`` impl keeps the threefry split/fold tree (cheap — keys
    are scalars) but generates bulk bits with the hardware
    RngBitGenerator, which is much cheaper per sample on TPU than full
    threefry.  Streams are deterministic per (seed, backend) but not
    bit-identical across backends — fine for simulation noise, whose
    contracts are statistical.
    """
    return jax.random.key(seed, impl="rbg")


SMALL_LAM_MAX = 10.0
SMALL_STEPS = 40
PTRS_ROUNDS = 6


def _poisson_small(u, lam):
    """Exact inverse-CDF for lam <= SMALL_LAM_MAX (branch-free)."""
    p = jnp.exp(-lam)  # P(X = 0)
    cum = p
    k = jnp.zeros_like(lam)
    for i in range(1, SMALL_STEPS + 1):
        k = k + (u > cum)
        p = p * lam / i
        cum = cum + p
    return k


def _poisson_ptrs(key, lam, shape):
    """PTRS transformed rejection (Hormann 1993), fixed unrolled rounds."""
    log_lam = jnp.log(lam)
    b = 0.931 + 2.53 * jnp.sqrt(lam)
    a = -0.059 + 0.02483 * b
    inv_alpha = 1.1239 + 1.1328 / (b - 3.4)
    v_r = 0.9277 - 3.6224 / (b - 2.0)

    out = jnp.zeros(shape, jnp.float32)
    filled = jnp.zeros(shape, bool)
    for r in range(PTRS_ROUNDS):
        kr = jax.random.fold_in(key, r)
        u = jax.random.uniform(jax.random.fold_in(kr, 0), shape) - 0.5
        v = jax.random.uniform(jax.random.fold_in(kr, 1), shape)
        us = 0.5 - jnp.abs(u)
        cand = jnp.floor((2.0 * a / us + b) * u + lam + 0.43)
        # fast acceptance
        fast = (us >= 0.07) & (v <= v_r)
        # immediate rejection
        bad = (cand < 0) | ((us < 0.013) & (v > us))
        # full acceptance test
        log_acc = (
            jnp.log(v * inv_alpha / (a / (us * us) + b))
            <= cand * log_lam - lam - jax.lax.lgamma(cand + 1.0)
        )
        accept = fast | (~bad & log_acc)
        out = jnp.where(~filled & accept, cand, out)
        filled = filled | accept
    # moment-matched fallback for unfilled lanes (< 1e-7 of samples)
    z = jax.random.normal(jax.random.fold_in(key, PTRS_ROUNDS), shape)
    fallback = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z), 0.0)
    return jnp.where(filled, out, fallback)


#: above this many elements, chunk the draw over the leading axis —
#: both branches evaluate masked-dense, so an unchunked full-frame
#: multi-read draw holds ~10 live (nreads, na, na) intermediates
#: (OOMs 16 GB HBM at (14, 4088, 4088)); each leading slice is still
#: tens of MPix, plenty to saturate the VPU.
CHUNK_ELEMS = 1 << 27


def _poisson_masked(key, lam_b):
    k_small, k_big = jax.random.split(key)
    u = jax.random.uniform(k_small, lam_b.shape)
    small = _poisson_small(u, jnp.minimum(lam_b, SMALL_LAM_MAX))
    big = _poisson_ptrs(
        k_big, jnp.maximum(lam_b, SMALL_LAM_MAX + 1e-3), lam_b.shape
    )
    return jnp.where(lam_b <= SMALL_LAM_MAX, small, big)


@functools.partial(jax.jit, static_argnames=("shape",))
def poisson(key, lam, shape=None):
    """Poisson deviates, float32 counts.

    ``lam`` broadcasts to ``shape``; exact for lam <= 10, PTRS-exact
    above (with a vanishing moment-matched fallback).  Large draws are
    chunked over the leading axis (distinct per-slice keys), bounding
    peak HBM at ~1 output buffer + 1 slice of intermediates.
    """
    lam = jnp.asarray(lam, jnp.float32)
    if shape is None:
        shape = lam.shape
    size = 1
    for s in shape:
        size *= s
    if size > CHUNK_ELEMS and len(shape) >= 2 and shape[0] > 1:
        keys = jax.random.split(key, shape[0])
        if lam.shape == tuple(shape):
            return jax.lax.map(
                lambda kl: _poisson_masked(kl[0], kl[1]), (keys, lam)
            )
        lam_inner = jnp.broadcast_to(lam, shape[1:])
        return jax.lax.map(
            lambda k: _poisson_masked(k, lam_inner), keys
        )
    return _poisson_masked(key, jnp.broadcast_to(lam, shape))
