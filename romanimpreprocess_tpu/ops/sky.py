"""Sky estimation: binning, smoothed-histogram mode, 2-D Legendre fit.

Re-implements the reference's ``utils/sky.py`` (``binkxk:20``,
``smooth_mode:46``, ``medfit:96``) in JAX.  ``medfit`` fits
``sum_ij c_ij P_i(u) P_j(v)`` (total degree <= order) to the N x N block
nanmedians and reconstructs the model on the full pixel grid via two
small matmuls.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _norm

from .legendre import legendre_basis_1d


def binkxk(arr, k):
    """k x k mean binning of a 2-D array (remainder pixels dropped).

    Strided-slice adds instead of a reshape+mean: the (nyo, k, nxo, k)
    reshape forces a lane-layout transform on TPU (~10 ms at 4096^2
    where the adds are free).  NaN poisons its block, as with mean.
    """
    ny, nx = arr.shape
    nyo, nxo = ny // k, nx // k
    a = arr[: k * nyo, : k * nxo]
    r = a[0::k]
    for i in range(1, k):
        r = r + a[i::k]
    c = r[:, 0::k]
    for j in range(1, k):
        c = c + r[:, j::k]
    return c / (k * k)


def smooth_mode(arr, pc=25.0, pksmooth=0.5, niter=3, nbin=21):
    """Mode of the Gaussian-smoothed histogram (nan-aware).

    Same iteration as the reference (``sky.py:46-93``): percentile-based
    center/width initialization, ``niter`` rounds of a 21-point kernel
    density scan with quadratic peak refinement.  Returns
    (mode, sigma * pksmooth).
    """
    flat = arr.ravel()
    # one sort for all three percentiles
    c1, c2, c3 = jnp.nanpercentile(
        flat, jnp.asarray([pc, 50.0, 100.0 - pc])
    )
    gauss_iqr = float(_norm.ppf((100.0 - pc) / 100.0) * 2)
    ctr = c2
    sigma = (c3 - c1) / gauss_iqr

    offsets = jnp.linspace(-1.0, 1.0, nbin)
    valid = ~jnp.isnan(flat)
    vals = jnp.where(valid, flat, 0.0)

    def one_iter(ctr, _):
        z = ctr + offsets * sigma
        # weights for interior bins only (ends stay zero, as in reference)
        d = (z[1:-1, None] - vals[None, :]) / (pksmooth * sigma)
        w = jnp.exp(-0.5 * d * d) * valid[None, :]
        hist = jnp.zeros(nbin).at[1:-1].set(jnp.sum(w, axis=1))
        i_pk = jnp.argmax(hist)
        b = (hist[i_pk + 1] - hist[i_pk - 1]) / 2.0
        a = (hist[i_pk + 1] + hist[i_pk - 1]) / 2.0 - hist[i_pk]
        ctr = z[i_pk] + (z[1] - z[0]) * (-b / (2.0 * a))
        return ctr, None

    ctr, _ = jax.lax.scan(one_iter, ctr, None, length=niter)
    return ctr, sigma * pksmooth


def _float_order_key(x):
    """Monotone map float32 -> uint32 (IEEE total order; NaN -> max)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    bu = b.astype(jnp.uint32)
    key = jnp.where(
        b < 0,
        ~bu,  # negative floats: reversed order below the positives
        bu + jnp.uint32(0x80000000),
    )
    return jnp.where(jnp.isnan(x), jnp.uint32(0xFFFFFFFF), key)


def _key_to_float(key):
    """Inverse of :func:`_float_order_key` (excluding the NaN bucket)."""
    b = jnp.where(
        key >= jnp.uint32(0x80000000),
        key - jnp.uint32(0x80000000),
        ~key,
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def block_nanmedian(arr, N):
    """Exact nanmedian of N x N blocks by bit-bisection selection.

    A sort of the full frame costs ~10x more on TPU than 32 rounds of
    per-block counting: the k-th order statistic's uint32 key is found
    one bit at a time (largest m with count(x < m) <= k), averaging the
    two middle elements for even counts exactly as numpy does.  Fully
    deterministic and bit-identical to ``nanmedian``.
    """
    ny, nx = arr.shape
    ky, kx = ny // N, nx // N
    py, px = (ny % N) // 2, (nx % N) // 2
    blocks = arr[py : py + N * ky, px : px + N * kx].reshape(N, ky, N, kx)
    keys = _float_order_key(blocks.astype(jnp.float32))

    cnt = jnp.sum(~jnp.isnan(blocks), axis=(1, 3))  # valid per block
    k_lo = jnp.maximum((cnt - 1) // 2, 0)
    k_hi = cnt // 2

    # both middle order statistics in one bisection (stacked targets)
    k_targets = jnp.stack([k_lo, k_hi])  # (2, N, N)

    def body(bit, m):
        cand = m | (jnp.uint32(1) << bit)
        count = jnp.sum(
            (keys[None] < cand[:, :, None, :, None]).astype(jnp.int32),
            axis=(2, 4),
        )
        return jnp.where(count <= k_targets, cand, m)

    m = jnp.zeros((2, N, N), jnp.uint32)
    m = jax.lax.fori_loop(0, 32, lambda i, m: body(jnp.uint32(31 - i), m), m)
    vals = _key_to_float(m)
    med = 0.5 * (vals[0] + vals[1])
    return jnp.where(cnt > 0, med, jnp.nan)


def _tri_indices(order):
    """(i, j) exponent pairs in the reference's coefficient ordering
    (``sky.py:127-134``): i ascending, j in 0..order-i."""
    return [(i, j) for i in range(order + 1) for j in range(order + 1 - i)]


def medfit(arr, N=8, order=2, pallas=False):
    """Low-order 2-D Legendre fit to block nanmedians.

    Returns (coef, model) where ``model[y, x] = sum coef_k P_i(u) P_j(v)``
    with u, v the x/y coordinates scaled to [-1, 1) and the (i, j)
    ordering of the reference (``sky.py:96-191``).  ``pallas=True``
    routes the block medians through the fused TPU kernel
    (``median_pallas.block_nanmedian_fused``, bit-identical).
    """
    ny, nx = arr.shape
    kx, ky = nx // N, ny // N
    px, py = (nx % N) // 2, (ny % N) // 2

    u_ = 2 * (px - 0.5 + kx * jnp.linspace(0.5, N - 0.5, N)) / nx - 1
    v_ = 2 * (py - 0.5 + ky * jnp.linspace(0.5, N - 0.5, N)) / ny - 1

    if pallas:
        from .median_pallas import block_nanmedian_fused

        meds = block_nanmedian_fused(arr, N)
    else:
        meds = block_nanmedian(arr, N)

    terms = _tri_indices(order)
    nc = len(terms)
    Pu = legendre_basis_1d(order, u_)  # (order+1, N)
    Pv = legendre_basis_1d(order, v_)
    # basis[k, jy, ix] = P_i(u[ix]) P_j(v[jy])
    basis = jnp.stack([Pv[j][:, None] * Pu[i][None, :] for i, j in terms])

    good = ~jnp.isnan(meds)
    m = jnp.where(good, meds, 0.0)
    bflat = basis.reshape(nc, N * N) * good.ravel()[None, :]
    A = bflat @ bflat.T
    b = bflat @ m.ravel()
    coef = jnp.linalg.solve(A, b)

    uu = jnp.linspace(-1.0, 1.0 - 2.0 / nx, nx)
    vv = jnp.linspace(-1.0, 1.0 - 2.0 / ny, ny)
    LPX = legendre_basis_1d(order, uu)  # (order+1, nx)
    LPY = legendre_basis_1d(order, vv)  # (order+1, ny)
    # model = sum_k coef_k outer(LPY[j_k], LPX[i_k]) as ONE rank-(order+1)
    # matmul chain: (ny, K) @ (K, K) @ (K, nx).  The term-by-term outer
    # accumulation wrote the full frame once per term (6 HBM passes at
    # order 2); this is a single MXU pass.  precision=highest: the
    # default TPU f32 matmul rounds through bf16 (~4e-3 relative),
    # which would swamp the fit itself.
    cm = jnp.zeros((order + 1, order + 1), dtype=jnp.float32)
    for k, (i, j) in enumerate(terms):
        cm = cm.at[j, i].set(coef[k])
    model = jax.numpy.einsum(
        "jy,ji,ix->yx", LPY.astype(jnp.float32), cm,
        LPX.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(arr.dtype)
    return coef, model


def sky_model_from_coefs(coefs, ny, nx, order):
    """Reconstruct the medfit sky model from stored coefficients."""
    terms = _tri_indices(order)
    uu = np.linspace(-1.0, 1.0 - 2.0 / nx, nx)
    vv = np.linspace(-1.0, 1.0 - 2.0 / ny, ny)
    LPX = np.asarray(legendre_basis_1d(order, uu))
    LPY = np.asarray(legendre_basis_1d(order, vv))
    model = np.zeros((ny, nx))
    for k, (i, j) in enumerate(terms):
        model += float(coefs[k]) * np.outer(LPY[j], LPX[i])
    return model


def bisect_quantiles(x, qs, iters=27):
    """Sort-free quantiles by vectorized bisection (device).

    ``jnp.percentile`` sorts the full array (~46 ms at 4096^2 on v5e);
    counting-bisection costs ``iters`` masked reductions (~3 ms) and
    converges to (max-min) * 2^-iters — below float32 resolution of
    the data range, so statistically identical for noise clipping.

    x : array; qs : static tuple/list of fractions in (0, 1).
    Returns a (len(qs),) array.
    """
    flat = x.ravel()
    n = flat.shape[0]
    targets = jnp.asarray([float(q) * n for q in qs], jnp.float32)
    lo = jnp.full((len(qs),), jnp.min(flat))
    hi = jnp.full((len(qs),), jnp.max(flat))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        # count of elements <= mid, for all quantiles in one pass
        cnt = (flat[None, :] <= mid[:, None]).sum(axis=1).astype(
            jnp.float32
        )
        too_low = cnt < targets
        lo = jnp.where(too_low, mid, lo)
        hi = jnp.where(too_low, hi, mid)
    return 0.5 * (lo + hi)
