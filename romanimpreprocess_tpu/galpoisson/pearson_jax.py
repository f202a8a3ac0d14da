"""On-device (JAX/TPU) Pearson-family samplers.

Device-resident counterpart of :mod:`.pearson` (the host backend):
same admissibility dispatch, parameter solutions, and target moments as
the reference (``GalPoisson/draw_with_tilnus.py:12-126``), but drawn in
one jitted, shape-static program so the noise engine's 'O' layer never
leaves HBM (SURVEY.md §7.5; the reference draws type-4 deviates in a
per-pixel Python loop, ``draw_with_tilnus.py:580-584``).

Execution shape (TPU-first, no data-dependent shapes):

- Types 1/3/5/6 are direct transforms of Beta/Gamma deviates and run
  dense over all lanes (masked-select at the end).
- Type 4 lanes are *compacted* (cumsum + scatter, no host round trip)
  into fixed-size chunks and sampled by batched rejection — Devroye
  proposals (Heinrich 2004 §7) for lanes with a workable predicted
  acceptance rate, the two-branch mixture accept-reject proposal
  otherwise — inside a ``lax.while_loop`` that exits as soon as every
  lane has accepted.  Chunks past the actual type-4 count cost one
  loop-condition evaluation each.
- Type-4 lanes with ``m > M_CF_CUT`` (nearly Gaussian: excess kurtosis
  ~ 3/m) use a variance-exact Cornish-Fisher polynomial draw instead:
  above that the rejection constants lose float32 accuracy to
  catastrophic cancellation (terms ~ m log m), while the CF moment
  error O(gamma1^3, gamma2^2) is already below float32 noise.
  Rejection stragglers past ``max_rounds`` fall back the same way.

Statistical parity with the host backend is gated by
``tests/test_pearson_jax.py`` (same moment envelopes as the
reference's ``test_pearson.py``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammainc, gammaln

from ..ops import rand

__all__ = ["draw_from_pearson_jax"]

#: type-4 lanes with m above this use the Cornish-Fisher path.
M_CF_CUT = 256.0
#: predicted Devroye acceptance below this routes a lane to the
#: mixture accept-reject proposal (reference threshold is 0.005 for a
#: *scalar* loop; batched rounds prefer a higher floor).
ACC_AR_CUT = 0.02
#: default rejection-buffer width (lanes per compacted chunk).
REJ_BUF = 1 << 17


# -- stable complex log-gamma (real part) -----------------------------------

_LANCZOS_G = 7.0
_LANCZOS = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def _lgamma_re(x, y):
    """Re(loggamma(x + i*y)) for x >= 1 (Lanczos g=7, real arithmetic —
    TPU has no complex lgamma)."""
    ar = jnp.full_like(x, _LANCZOS[0])
    ai = jnp.zeros_like(x)
    for k in range(1, 9):
        d = x - 1.0 + k
        den = d * d + y * y
        ar = ar + _LANCZOS[k] * d / den
        ai = ai - _LANCZOS[k] * y / den
    tx = x + (_LANCZOS_G - 0.5)
    return (
        0.5 * jnp.log(2.0 * jnp.pi)
        + (x - 0.5) * 0.5 * jnp.log(tx * tx + y * y)
        - y * jnp.arctan2(y, tx)
        - tx
        + 0.5 * jnp.log(ar * ar + ai * ai)
    )


def _log_k(m, nu, a):
    """log of the Pearson-IV normalization (Heinrich 2004 eq. 5)."""
    return (
        (2.0 * m - 2.0) * jnp.log(2.0)
        + 2.0 * _lgamma_re(m, 0.5 * nu)
        - (jnp.log(jnp.pi) + jnp.log(a) + gammaln(2.0 * m - 1.0))
    )


# -- shared moment helpers ---------------------------------------------------

def _betas(t21, t31, t41, I):
    beta1 = t31 * t31 / (t21 * t21 * t21 * I)
    beta2 = (3.0 * t21 * t21 * I + t41) / (t21 * t21 * I)
    return beta1, beta2


# -- Types 1 / 3 / 5 / 6: dense transforms of Beta/Gamma draws ---------------

def _draw_type1(key, t21, t31, t41, I, mask):
    beta1, beta2 = _betas(t21, t31, t41, I)
    u = 3.0 * (beta1 - beta2 + 1.0) / ((beta2 - 3.0) - 1.5 * beta1)
    v = beta1 * (u + 2.0) ** 2 / (4.0 * (u + 1.0))
    u = jnp.where(mask, u, 4.0)
    v = jnp.where(mask & (v >= 0), v, 0.0)
    s = jnp.sqrt(v / (v + 4.0))
    a_plus = 0.5 * u * (1.0 + s)
    b_plus = 0.5 * u * (1.0 - s)
    want_neg = t31 < 0
    cond = jnp.where(want_neg, a_plus > b_plus, a_plus < b_plus)
    a = jnp.clip(jnp.where(cond, a_plus, b_plus), 1e-5, 1e7)
    b = jnp.clip(jnp.where(cond, b_plus, a_plus), 1e-5, 1e7)
    mean = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1.0))
    c = jnp.sqrt(t21 * I / var)
    y = rand.beta(key, a, b)
    return c * (y - mean)


def _draw_type3(key, t21, t31, I, mask):
    t31s = jnp.where(jnp.abs(t31) > 1e-12, t31, 1e-12)
    scale = jnp.abs(t31s) / (2.0 * t21)
    shape = 4.0 * t21**3 * I / (t31s * t31s)
    shape = jnp.clip(jnp.where(mask, shape, 4.0), 1e-5, 1e7)
    sign = jnp.where(t31 > 0, 1.0, -1.0)
    y = rand.gamma(key, shape)
    return sign * scale * (y - shape)


def _draw_type5(key, t21, t31, I, mask):
    beta1, _ = _betas(t21, t31, 0.0, I)
    beta1 = jnp.where(mask & (beta1 > 1e-12), beta1, 1e-12)
    sqrt_t = jnp.sqrt(4.0 + beta1)
    p_plus = 4.0 * (1.0 + 2.0 / beta1 + sqrt_t / beta1)
    p_minus = 4.0 * (1.0 + 2.0 / beta1 - sqrt_t / beta1)
    p = jnp.where(p_plus > 4.0, p_plus, p_minus)
    p = jnp.clip(p, 3.0 + 1e-5, 1e7)
    sigma = jnp.sqrt(t21 * I)
    g5 = sigma * (p - 2.0) * jnp.sqrt(p - 3.0)
    a = p - 1.0
    mu = g5 / (a - 1.0)
    y = g5 / jnp.maximum(rand.gamma(key, a), 1e-37)
    sign = jnp.where(t31 >= 0, 1.0, -1.0)
    return sign * (y - mu)


def _draw_type6(key, t21, t31, t41, I, mask):
    beta1, beta2 = _betas(t21, t31, t41, I)
    sign = jnp.where(t31 >= 0, 1.0, -1.0)
    r = 6.0 * (beta2 - beta1 - 1.0) / (3.0 * beta1 - 2.0 * beta2 + 6.0)
    eps = r * r / (4.0 + (beta1 / 4.0) * (r + 2.0) ** 2 / (r + 1.0))
    disc = jnp.where(mask, r * r - 4.0 * eps, 1.0)
    d = jnp.sqrt(jnp.clip(disc, 0.0, None))
    q1 = (2.0 - r + d) / 2.0
    q2 = (r - 2.0 + d) / 2.0
    alpha = jnp.clip(jnp.where(mask, q2 + 1.0, 4.0), 1e-5, 1e7)
    beta = jnp.clip(jnp.where(mask, q1 - q2 - 1.0, 8.0), 2.0 + 1e-4, 1e7)
    var1 = alpha * (alpha + beta - 1.0) / ((beta - 2.0) * (beta - 1.0) ** 2)
    scale = jnp.sqrt(t21 * I / var1)
    shift = scale * alpha / (beta - 1.0)
    k1, k2 = jax.random.split(key)
    y = rand.gamma(k1, alpha) / jnp.maximum(rand.gamma(k2, beta), 1e-37)
    return sign * (scale * y - shift)


# -- Type 4 -------------------------------------------------------------------

def _type4_params(t21, t31, t41, I, mask):
    """(m, nu, a, lam, valid) with lanes outside ``mask`` or with an
    inadmissible solution mapped to safe placeholders."""
    beta1, beta2 = _betas(t21, t31, t41, I)
    mu2 = t21 * I
    denom = 2.0 * beta2 - 3.0 * beta1 - 6.0
    r = 6.0 * (beta2 - beta1 - 1.0) / jnp.where(
        jnp.abs(denom) > 1e-20, denom, 1e-20
    )
    inner = 16.0 * (r - 1.0) - beta1 * (r - 2.0) ** 2
    valid = mask & (r > 1.0) & (inner > 0.0)
    r = jnp.where(valid, r, 4.0)
    inner = jnp.where(valid, inner, 16.0)
    sign = jnp.where(t31 >= 0, -1.0, 1.0)  # sign(mu3) = -sign(nu)
    nu = sign * r * (r - 2.0) * jnp.sqrt(beta1) / jnp.sqrt(inner)
    a = jnp.sqrt(mu2 * inner) / 4.0
    m = r / 2.0 + 1.0
    lam = a * nu / (2.0 * (m - 1.0))
    return m, nu, a, lam, valid


def _devroye_consts(m, nu, a):
    b = 2.0 * m - 2.0
    M = jnp.arctan2(-nu, b)
    cosM = b / jnp.hypot(b, nu)
    r_const = b * jnp.log(cosM) - nu * M
    rc = jnp.exp(-r_const - _log_k(m, nu, a))
    acc = (jnp.pi / (4.0 * rc)) * jnp.sqrt(
        2.0 / (jnp.pi * (2.0 * m + nu * nu / (2.0 * m)))
    )
    return b, M, r_const, rc, acc


def _rej_rounds(key, m, nu, a, lam, pending0, max_rounds):
    """Batched type-4 rejection on one compacted chunk.

    Lanes choose Devroye vs the mixture accept-reject proposal by the
    Heinrich acceptance-rate predictor; the while_loop exits when every
    pending lane has accepted.  Returns (draws, still_pending).
    """
    b, M, r_const, rc, acc = _devroye_consts(m, nu, a)
    use_dev = acc >= ACC_AR_CUT

    # mixture-proposal constants (reference pt4_rvs_ar)
    theta = nu / (2.0 * m)
    root = jnp.sqrt(1.0 + theta * theta)
    logk = _log_k(m, nu, a)
    log_dxds = jnp.log(a) + 0.5 * jnp.log1p(theta * theta)
    alpha = 2.0 * m - 1.0
    log_P_left = jnp.log(0.5) + betaln(0.5, m - 0.5)
    P = jnp.clip(gammainc(alpha, 2.0 * m), 1e-30, 1.0)
    log_P_right_full = (
        2.0 * m - (2.0 * m - 1.0) * jnp.log(2.0 * m) + gammaln(alpha)
    )
    log_P_right = log_P_right_full + jnp.log(P)
    logZ = jnp.logaddexp(log_P_left, log_P_right)
    log_g0 = -logZ
    # Branch-pick probability uses the UNtruncated right-branch mass:
    # the right proposal is drawn by rejection (untruncated inverse-
    # gamma, auto-failing Y <= 1) rather than the host's inverse-CDF
    # truncated draw, so right-branch values land P times less often
    # per pick; boosting the pick rate by 1/P restores the realized
    # proposal density to the envelope shape the accept test assumes.
    w_left = jnp.exp(
        log_P_left - jnp.logaddexp(log_P_left, log_P_right_full)
    )

    def log_fS(s):
        xi = root * s - theta
        return logk + log_dxds - m * jnp.log1p(xi * xi) - nu * jnp.arctan(xi)

    logc = jnp.maximum(0.0, log_fS(jnp.zeros_like(m)) - log_g0)
    flip = nu > 0.0
    tiny = jnp.float32(1e-37)

    def body(carry):
        i, key, out, pending = carry
        key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
        shape = m.shape

        # --- Devroye proposal (Heinrich 2004 section 7) ---
        x = 4.0 * jax.random.uniform(k1, shape)
        swap = x > 2.0
        x = jnp.where(swap, x - 2.0, x)
        logb = x > 1.0
        z = jnp.where(logb, jnp.log(jnp.where(logb, x - 1.0, 1.0)), 0.0)
        x = jnp.where(logb, 1.0 - z, x)
        x = jnp.where(swap, M + rc * x, M - rc * x)
        ok = jnp.abs(x) < jnp.pi / 2.0
        logu = jnp.log(jnp.maximum(jax.random.uniform(k2, shape), tiny))
        crit = (
            b * jnp.log(jnp.abs(jnp.cos(jnp.where(ok, x, 0.0))))
            - nu * x - r_const
        )
        acc_d = ok & (z + logu <= crit)
        val_d = a * jnp.tan(jnp.where(ok, x, 0.0)) + lam

        # --- mixture accept-reject proposal ---
        left = jax.random.uniform(k3, shape) < w_left
        df = 2.0 * m - 1.0
        T = rand.student_t(k4, jnp.broadcast_to(df, shape))
        s_left = -jnp.abs(T) / jnp.sqrt(df)
        G = jnp.maximum(rand.gamma(k5, jnp.broadcast_to(alpha, shape)), tiny)
        Y = 2.0 * m / G
        trunc_ok = Y > 1.0  # truncated inverse-gamma: reject Y <= 1
        s_right = Y - 1.0
        s0 = jnp.where(left, s_left, s_right)
        s = jnp.where(flip, -s0, s0)
        lf = log_fS(s)
        lg = log_g0 + jnp.where(
            s0 < 0.0,
            -m * jnp.log1p(s0 * s0),
            jnp.where(
                s0 > 0.0,
                -2.0 * m * jnp.log1p(jnp.abs(s0))
                + (2.0 * m * s0) / (1.0 + jnp.abs(s0)),
                0.0,
            ),
        )
        log_alpha = lf - lg - logc
        logu2 = jnp.log(jnp.maximum(jax.random.uniform(k6, shape), tiny))
        acc_a = (left | trunc_ok) & (logu2 < jnp.minimum(log_alpha, 0.0))
        xi = root * s - theta
        val_a = a * xi + lam

        accept = jnp.where(use_dev, acc_d, acc_a)
        val = jnp.where(use_dev, val_d, val_a)
        out = jnp.where(pending & accept, val, out)
        pending = pending & ~accept
        return i + 1, key, out, pending

    def cond(carry):
        i, _, _, pending = carry
        return (i < max_rounds) & jnp.any(pending)

    _, _, out, pending = jax.lax.while_loop(
        cond, body, (jnp.int32(0), key, jnp.zeros_like(m), pending0)
    )
    return out, pending


def _cf_draw(key, mu2, g1, g2):
    """Cornish-Fisher polynomial-of-normal draw matching (mu2, gamma1,
    gamma2) to O(gamma^2), with the variance renormalized exactly."""
    z = jax.random.normal(key, mu2.shape)
    bq = g1 / 6.0
    al = g2 / 24.0 + 2.0 * (-g1 * g1 / 36.0)
    be = 3.0 * (g2 / 24.0) + 5.0 * (-g1 * g1 / 36.0)
    h = (1.0 - be) * z + bq * (z * z - 1.0) + al * z * z * z
    var_h = (1.0 - be) ** 2 + 2.0 * bq * bq + 15.0 * al * al + 6.0 * al * (
        1.0 - be
    )
    return jnp.sqrt(mu2 / jnp.maximum(var_h, 1e-12)) * h


def _compact_indices(mask, n_chunks, width):
    """Compact ``jnp.where(mask)``-style lane indices to the front of a
    (n_chunks, width) index array (scatter by cumsum position — no host
    round trip, no sort).  Overflow lanes keep index ``n`` (dropped)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    total = n_chunks * width
    idx = jnp.full((total,), n, jnp.int32)
    idx = idx.at[jnp.where(mask, pos, total)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return idx.reshape(n_chunks, width), pos


def _draw_type4(key, t21, t31, t41, I, mask, rej_buf, max_rounds):
    m, nu, a4, lam, valid = _type4_params(t21, t31, t41, I, mask)
    mu2 = t21 * I
    beta1, beta2 = _betas(t21, t31, t41, I)
    g1 = jnp.sign(t31) * jnp.sqrt(jnp.clip(beta1, 0.0, None))
    g2 = beta2 - 3.0

    kcf, krej = jax.random.split(key)
    d_cf = _cf_draw(kcf, jnp.clip(mu2, 1e-12, None), g1, g2)

    rej = valid & (m <= M_CF_CUT)
    n = m.shape[0]
    if n <= rej_buf:
        d_rej, still = _rej_rounds(krej, m, nu, a4, lam, rej, max_rounds)
        d_rej = jnp.where(still, d_cf, d_rej)
    else:
        n_chunks = -(-n // rej_buf)
        idx, _ = _compact_indices(rej, n_chunks, rej_buf)

        def chunk(carry_key, idx_row):
            carry_key, kk = jax.random.split(carry_key)
            live = idx_row < n
            gi = jnp.minimum(idx_row, n - 1)
            d_row, still = _rej_rounds(
                kk, m[gi], nu[gi], a4[gi], lam[gi], live, max_rounds
            )
            return carry_key, (d_row, still)

        _, (d_rows, still_rows) = jax.lax.scan(chunk, krej, idx)
        flat_idx = jnp.where(
            (idx < n) & ~still_rows, idx, n
        ).reshape(-1)
        d_rej = jnp.zeros_like(m).at[flat_idx].set(
            d_rows.reshape(-1), mode="drop"
        )
        covered = jnp.zeros((n,), bool).at[flat_idx].set(True, mode="drop")
        d_rej = jnp.where(covered, d_rej, d_cf)

    return jnp.where(rej, d_rej, d_cf)


# -- dispatcher ---------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("atol", "rej_buf", "max_rounds")
)
def draw_from_pearson_jax(key, tilnu_21, tilnu_31, tilnu_41, I_arr, *,
                          atol=0.0, rej_buf=REJ_BUF, max_rounds=768):
    """One zero-mean Pearson deviate per element of ``I_arr``, on device.

    ``tilnu_*`` broadcast against ``I_arr`` (scalars or per-pixel maps
    — the noise engine passes per-endslice maps so all endslice classes
    draw in one program).  Elements outside the admissibility region
    draw 0, as in the reference dispatcher
    (``draw_with_tilnus.py:46-126``).
    """
    I = jnp.clip(jnp.asarray(I_arr, jnp.float32), 0.01, None)
    shape = I.shape
    I = I.ravel()
    t21 = jnp.broadcast_to(jnp.asarray(tilnu_21, jnp.float32), shape).ravel()
    t31 = jnp.broadcast_to(jnp.asarray(tilnu_31, jnp.float32), shape).ravel()
    t41 = jnp.broadcast_to(jnp.asarray(tilnu_41, jnp.float32), shape).ravel()

    beta1, beta2 = _betas(t21, t31, t41, I)
    base = (
        (beta2 > 0) & (beta1 >= 0) & (beta2 > beta1 + 1)
        & (beta2 > 0.75 * beta1)
    )
    rhs1 = 1.5 * beta1 + 3.0
    rhs2 = (48.0 + 39.0 * beta1 + 6.0 * (4.0 + beta1) ** 1.5) / (
        32.0 - beta1
    )
    eq1 = jnp.abs(beta2 - rhs1) <= atol
    eq2 = jnp.abs(beta2 - rhs2) <= atol
    type1 = base & (beta2 < rhs1 - atol) & ~eq1
    type3 = base & eq1
    type5 = base & eq2
    type6 = base & (beta2 > rhs1 + atol) & (beta2 < rhs2 - atol) & ~eq1 & ~eq2
    type4 = base & (beta2 > rhs2 + atol) & (beta1 < 32.0) & ~eq2

    k1, k3, k4, k5, k6 = jax.random.split(key, 5)

    def _gated(mask, kk, fn):
        # scalar-pred cond: a type with no lanes costs one reduction,
        # not a dense Beta/Gamma draw
        return jax.lax.cond(
            jnp.any(mask), fn, lambda k: jnp.zeros_like(I), kk
        )

    out = jnp.zeros_like(I)
    out = jnp.where(
        type1,
        _gated(type1, k1, lambda k: _draw_type1(k, t21, t31, t41, I, type1)),
        out,
    )
    out = jnp.where(
        type3, _gated(type3, k3, lambda k: _draw_type3(k, t21, t31, I, type3)),
        out,
    )
    out = jnp.where(
        type5, _gated(type5, k5, lambda k: _draw_type5(k, t21, t31, I, type5)),
        out,
    )
    out = jnp.where(
        type6,
        _gated(type6, k6, lambda k: _draw_type6(k, t21, t31, t41, I, type6)),
        out,
    )
    out = jnp.where(
        type4,
        _gated(
            type4, k4,
            lambda k: _draw_type4(
                k, t21, t31, t41, I, type4, rej_buf, max_rounds
            ),
        ),
        out,
    )
    return out.reshape(shape)
