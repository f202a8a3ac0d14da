"""Fast branch-free Poisson sampling for TPU.

``jax.random.poisson`` costs ~3.6 ns/sample on v5e (per-sample rejection
with while-loop control flow) — ~850 ms per full-frame exposure draw.
This sampler is fixed-trip-count and fully vectorized:

- lam <= 10: exact inverse-CDF by a fixed recurrence (40 steps; 18 when
  no lane in the chunk exceeds lam 3.5 — a scalar ``lax.cond``, so the
  sky-dominated regime pays the short loop), pure fused multiply-adds;
- whole chunk at lam <= 32: one shared 76-step exact recurrence for all
  lanes (the noise engine's sky-dominated 'P' resampling at ~16 e/read
  lands here — no PTRS transcendentals at all);
- lam > 10: Hormann's PTRS transformed rejection with a fixed number of
  unrolled rounds (acceptance ~0.94/round, 6 rounds leave < 1e-7
  unfilled), falling back to a moment-matched rounded normal for any
  straggler lane.  The acceptance test's log-factorial is a Stirling
  series + small-integer table instead of ``lax.lgamma`` (~3x fewer
  VPU ops, error < 1e-5 in the log — far below the acceptance-noise
  floor).  A chunk with no lane above lam 10 skips PTRS entirely
  (scalar ``lax.cond``).

Multi-frame draws at a shared rate map (the sim's per-read increments,
``sim_to_l1._accumulate_resultants``) reuse one CDF recurrence and one
set of PTRS constants across all frames in a chunk: the per-read
marginal cost is just the compare-accumulate sweep.  This took the
full-frame 14-read draw from 190 ms to well under half (profile:
``tools/profile_sim.py``).

Distribution-exactness is tested against the scipy pmf
(``tests/test_ops.py::test_custom_poisson_distribution``).
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
#: short-recurrence tier: P(X > 18 | lam <= 3.5) < 4e-10
SMALL_LAM_LO = 3.5
SMALL_STEPS_LO = 18
#: mid tier: when a whole chunk sits at lam <= 32 (e.g. the noise
#: engine's sky-dominated 'P' resampling at ~16 e/read), one shared
#: 76-step CDF recurrence replaces BOTH the small/PTRS split and all
#: of PTRS's per-round transcendentals; P(X > 76 | lam = 32) < 1e-11
MID_LAM_MAX = 32.0
MID_STEPS = 76
PTRS_ROUNDS = 6
#: above this lam the PTRS float32 acceptance test loses to its own
#: term cancellation and the skew-corrected normal takes over
PTRS_NORMAL_LAM = 3.0e4

_HALF_LOG_2PI = 0.9189385332046727
_LOG_FACT = (0.0, 0.0, 0.6931471805599453, 1.791759469228055,
             3.1780538303479458, 4.787491742782046, 6.579251212010101)


def _lgamma1p(x):
    """log(x!) for non-negative integer-valued float x: Stirling series
    for x >= 7 (|err| < 1e-5), exact select-chain table below."""
    xs = jnp.maximum(x, 7.0)
    inv = 1.0 / xs
    big = (
        (xs + 0.5) * jnp.log(xs) - xs + _HALF_LOG_2PI
        + inv * ((1.0 / 12.0) - (1.0 / 360.0) * inv * inv)
    )
    small = jnp.zeros_like(x)
    for k in range(2, 7):
        small = jnp.where(x > k - 0.5, _LOG_FACT[k], small)
    return jnp.where(x < 6.5, small, big)


def _poisson_small(u, lam, steps):
    """Exact inverse-CDF for lam <= SMALL_LAM_MAX (branch-free).

    ``u`` may have leading frame axes over ``lam``'s shape; the pmf
    recurrence runs once on ``lam`` and only the compare-accumulate
    broadcasts."""
    p = jnp.exp(-lam)  # P(X = 0)
    cum = p
    k = jnp.zeros_like(u)
    for i in range(1, steps + 1):
        k = k + (u > cum)
        p = p * (lam * (1.0 / i))
        cum = cum + p
    return k


def _poisson_ptrs(key, lam, shape):
    """PTRS transformed rejection (Hormann 1993), fixed unrolled rounds.

    ``lam`` broadcasts to ``shape``; the per-lam constants are computed
    on ``lam``'s own (possibly smaller) shape."""
    log_lam = jnp.log(lam)
    b = 0.931 + 2.53 * jnp.sqrt(lam)
    a = -0.059 + 0.02483 * b
    inv_alpha = 1.1239 + 1.1328 / (b - 3.4)
    v_r = 0.9277 - 3.6224 / (b - 2.0)
    log_inv_alpha = jnp.log(inv_alpha)

    out = jnp.zeros(shape, jnp.float32)
    filled = jnp.zeros(shape, bool)
    for r in range(PTRS_ROUNDS):
        kr = jax.random.fold_in(key, r)
        # one 32-bit word per lane per round, split 16/16 into (u, v):
        # RNG volume is the dominant cost of a full-frame multi-read
        # draw, and 16-bit uniforms only perturb the pmf near the
        # per-k candidate boundaries (total-variation error
        # <~ n_k * 2^-16 ~ 1e-4, far below the 200k-sample chi-square
        # gate's resolution and any physics tolerance here)
        bits = jax.random.bits(kr, shape, jnp.uint32)
        u = (jnp.float32(bits >> 16) + 0.5) * jnp.float32(2**-16) - 0.5
        v = (jnp.float32(bits & 0xFFFF) + 0.5) * jnp.float32(2**-16)
        us = 0.5 - jnp.abs(u)
        cand = jnp.floor((2.0 * a / us + b) * u + lam + 0.43)
        # fast acceptance
        fast = (us >= 0.07) & (v <= v_r)
        # immediate rejection
        bad = (cand < 0) | ((us < 0.013) & (v > us))
        # full acceptance test (Stirling log-factorial)
        log_acc = (
            jnp.log(v) + log_inv_alpha - jnp.log(a / (us * us) + b)
            <= cand * log_lam - lam - _lgamma1p(cand)
        )
        accept = fast | (~bad & log_acc)
        out = jnp.where(~filled & accept, cand, out)
        filled = filled | accept
    # Gaussian branch, two uses:
    # (a) moment-matched fallback for unfilled lanes (< 1e-7 of samples);
    # (b) the WHOLE draw for lam > PTRS_NORMAL_LAM — the PTRS acceptance
    #     test cancels lam-scale terms (cand*log_lam - lam - lgamma) with
    #     float32 rounding ~lam*2^-24, which measurably distorts the
    #     distribution above lam ~ 1e5 (observed +3% variance at 1e6).
    #     The one-term Cornish-Fisher skew correction (z^2-1)/6 keeps the
    #     third moment, so the normal branch's error ~O(1/lam) is far
    #     below the f32 cancellation it replaces.
    z = jax.random.normal(jax.random.fold_in(key, PTRS_ROUNDS), shape)
    gauss = jnp.maximum(
        jnp.round(lam + jnp.sqrt(lam) * z + (z * z - 1.0) / 6.0), 0.0
    )
    return jnp.where(filled & (lam <= PTRS_NORMAL_LAM), out, gauss)


GAMMA_ROUNDS = 5


def gamma(key, alpha, rounds=GAMMA_ROUNDS):
    """Gamma(alpha, 1) deviates, float32, fixed-trip-count.

    Marsaglia-Tsang squeeze rejection with ``rounds`` unrolled masked
    rounds (acceptance > 0.95 per round for alpha >= 1; 5 rounds leave
    < 1e-7 unfilled) and a Wilson-Hilferty moment-matched fallback;
    alpha < 1 via the boost identity G(a) = G(a+1) * U^(1/a).

    Exists because ``jax.random.gamma``'s data-dependent while_loop
    sampler crashes the TPU worker at full-frame sizes on the axon
    relay backend (verified at 2^24 lanes), and a fixed-round
    masked-dense sampler is the TPU-native formulation regardless —
    same design as :func:`poisson`.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    shape = alpha.shape
    k_boost, k_mt = jax.random.split(key)
    small = alpha < 1.0
    a1 = jnp.where(small, alpha + 1.0, alpha)
    d = a1 - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    out = jnp.zeros(shape, jnp.float32)
    filled = jnp.zeros(shape, bool)
    for r in range(rounds):
        kr = jax.random.fold_in(k_mt, r)
        z = jax.random.normal(jax.random.fold_in(kr, 0), shape)
        u = jnp.maximum(
            jax.random.uniform(jax.random.fold_in(kr, 1), shape), 1e-37
        )
        v = (1.0 + c * z) ** 3
        ok = v > 0.0
        vs = jnp.where(ok, v, 1.0)
        accept = ok & (
            jnp.log(u) < 0.5 * z * z + d - d * vs + d * jnp.log(vs)
        )
        out = jnp.where(~filled & accept, d * vs, out)
        filled = filled | accept
    zf = jax.random.normal(jax.random.fold_in(k_mt, rounds), shape)
    wh = a1 * (1.0 - 1.0 / (9.0 * a1) + zf / (3.0 * jnp.sqrt(a1))) ** 3
    out = jnp.where(filled, out, jnp.clip(wh, 1e-30, None))

    # boost: exp(log(u)/alpha) computed only where needed (alpha >= 1
    # lanes get exponent 0 -> factor 1)
    u = jnp.maximum(jax.random.uniform(k_boost, shape), 1e-37)
    boost = jnp.exp(
        jnp.where(small, jnp.log(u) / jnp.maximum(alpha, 1e-30), 0.0)
    )
    return out * boost


def beta(key, a, b, rounds=GAMMA_ROUNDS):
    """Beta(a, b) deviates from two fixed-round gammas."""
    k1, k2 = jax.random.split(key)
    ga = gamma(k1, a, rounds)
    gb = gamma(k2, b, rounds)
    return ga / jnp.maximum(ga + gb, 1e-37)


def student_t(key, df, rounds=GAMMA_ROUNDS):
    """Student-t deviates: Z / sqrt(ChiSq(df)/df), chi-square from the
    fixed-round gamma."""
    kz, kg = jax.random.split(key)
    df = jnp.asarray(df, jnp.float32)
    z = jax.random.normal(kz, df.shape)
    chi2 = 2.0 * gamma(kg, 0.5 * df, rounds)
    return z / jnp.sqrt(jnp.maximum(chi2 / df, 1e-37))


#: above this many elements, chunk the draw over the leading axis —
#: both branches evaluate masked-dense, so an unchunked full-frame
#: multi-read draw holds ~10 live (nreads, na, na) intermediates
#: (OOMs 16 GB HBM at (14, 4088, 4088)); each leading slice is still
#: tens of MPix, plenty to saturate the VPU.
CHUNK_ELEMS = 1 << 27


def _poisson_masked(key, lam, shape):
    """One draw of ``shape`` at rate ``lam`` (broadcastable to shape).

    Chunk-level adaptivity via scalar conds: skip PTRS when no lane is
    above SMALL_LAM_MAX; use the short CDF recurrence when no small
    lane is above SMALL_LAM_LO."""
    k_small, k_big = jax.random.split(key)
    lam_max = jnp.max(lam)

    def _mid_draw():
        # whole chunk at lam <= MID_LAM_MAX: ONE exact shared CDF
        # recurrence for every lane (no small/PTRS split, no
        # transcendentals beyond the initial exp(-lam))
        u = jax.random.uniform(k_small, shape)
        return _poisson_small(u, lam, MID_STEPS)

    def _split_draw():
        lam_s = jnp.minimum(lam, SMALL_LAM_MAX)

        def _small_draw():
            u = jax.random.uniform(k_small, shape)
            return jax.lax.cond(
                jnp.max(lam_s) > SMALL_LAM_LO,
                lambda: _poisson_small(u, lam_s, SMALL_STEPS),
                lambda: _poisson_small(u, lam_s, SMALL_STEPS_LO),
            )

        # skip the CDF recurrence (and its uniform draw) entirely when
        # no lane is in the small regime
        small = jax.lax.cond(
            jnp.min(lam) <= SMALL_LAM_MAX,
            _small_draw,
            lambda: jnp.zeros(shape, jnp.float32),
        )
        big = _poisson_ptrs(
            k_big, jnp.maximum(lam, SMALL_LAM_MAX + 1e-3), shape
        )
        return jnp.where(
            jnp.broadcast_to(lam <= SMALL_LAM_MAX, shape), small, big
        )

    def _tiered():
        return jax.lax.cond(
            lam_max <= MID_LAM_MAX, _mid_draw, _split_draw
        )

    # all-small chunks keep the short-recurrence fast path
    return jax.lax.cond(
        lam_max <= SMALL_LAM_MAX,
        lambda: jax.lax.cond(
            lam_max > SMALL_LAM_LO,
            lambda: _poisson_small(
                jax.random.uniform(k_small, shape), lam, SMALL_STEPS
            ),
            lambda: _poisson_small(
                jax.random.uniform(k_small, shape), lam, SMALL_STEPS_LO
            ),
        ),
        _tiered,
    )


@functools.partial(jax.jit, static_argnames=("shape",))
def poisson(key, lam, shape=None):
    """Poisson deviates, float32 counts.

    ``lam`` broadcasts to ``shape``; exact for lam <= 10, PTRS-exact
    up to ``PTRS_NORMAL_LAM`` (with a vanishing moment-matched
    fallback), skew-corrected normal above it (where the float32 PTRS
    acceptance test would distort the distribution).  Large draws are
    chunked over the leading axis (distinct per-chunk keys), bounding
    peak HBM at ~1 output buffer + 1 chunk of intermediates.  When
    ``lam`` is shared across the leading (frame) axis — the sim's
    per-read increments — each chunk reuses one set of pmf/PTRS
    constants for all its frames.
    """
    lam = jnp.asarray(lam, jnp.float32)
    if shape is None:
        shape = lam.shape
    size = 1
    for s in shape:
        size *= s
    if size > CHUNK_ELEMS and len(shape) >= 2 and shape[0] > 1:
        nlead = shape[0]
        if lam.shape == tuple(shape):
            keys = jax.random.split(key, nlead)
            return jax.lax.map(
                lambda kl: _poisson_masked(kl[0], kl[1], shape[1:]),
                (keys, lam),
            )
        # shared-rate frames: chunk several frames per step so the
        # constants amortize (python loop — nlead is static and small)
        per = max(1, int(CHUNK_ELEMS // max(size // nlead, 1)))
        chunks = []
        for i, start in enumerate(range(0, nlead, per)):
            rc = min(per, nlead - start)
            chunks.append(
                _poisson_masked(
                    jax.random.fold_in(key, i), lam,
                    (rc,) + tuple(shape[1:]),
                )
            )
        return jnp.concatenate(chunks, axis=0)
    return _poisson_masked(key, lam, shape)
