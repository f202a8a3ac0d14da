"""Legendre-basis evaluation with linear extrapolation beyond |z|=1.

TPU-native equivalent of the reference's ``_lin`` helper
(``src/romanimpreprocess/utils/ipc_linearity.py:192-231``): evaluates

    phi = sum_L coefs[L] * P_L(z)

with the Legendre three-term recursion, where for ``|z| > 1`` each
``P_L(z)`` is replaced by its tangent-line continuation from the
boundary, ``sign(z)^L * (1 + L(L+1)/2 * (|z|-1))`` (value and first
derivative of P_L at +-1), which keeps the inverse well behaved.

The polynomial order is static (it is the leading axis of ``coefs``),
so the recursion unrolls at trace time into a fixed chain of fused
multiply-adds — no dynamic control flow on device.
"""

import jax.numpy as jnp


def legendre_eval(z, coefs, linextrap=True):
    """Evaluate a per-pixel Legendre expansion.

    Parameters
    ----------
    z : jnp.ndarray
        Rescaled signal, any shape ``S``.
    coefs : jnp.ndarray
        Coefficient stack, shape ``(order+1,) + S`` (or broadcastable to
        it along the trailing axes).
    linextrap : bool
        If True, linearly extrapolate each P_L beyond |z|=1.

    Returns
    -------
    phi : jnp.ndarray, shape S
    exflag : jnp.ndarray of bool, shape S — True where |z| > 1.
    """
    z = jnp.asarray(z)
    exflag = jnp.abs(z) > 1.0

    phi = jnp.broadcast_to(coefs[0], z.shape).astype(z.dtype)
    poly_prev = jnp.ones_like(z)
    poly = z
    if linextrap:
        signz = jnp.sign(z)
        absz_excess = jnp.abs(z) - 1.0
        sign_pow = signz  # sign(z)**L, updated in the loop

    norder = coefs.shape[0]
    for L in range(1, norder):
        if linextrap:
            extrap = sign_pow * (1.0 + (L * (L + 1) / 2.0) * absz_excess)
            term = jnp.where(exflag, extrap, poly)
            sign_pow = sign_pow * signz
        else:
            term = poly
        phi = phi + coefs[L] * term
        # Legendre recursion: (L+1) P_{L+1} = (2L+1) z P_L - L P_{L-1}
        poly_next = ((2 * L + 1) / (L + 1)) * z * poly - (L / (L + 1)) * poly_prev
        poly_prev = poly
        poly = poly_next

    return phi, exflag


def legendre_basis_1d(order, u):
    """Stack [P_0(u), ..., P_order(u)] for a 1-D coordinate array.

    Used by the sky fitter (reference ``utils/sky.py:153-180``).
    """
    u = jnp.asarray(u)
    out = [jnp.ones_like(u)]
    if order >= 1:
        out.append(u)
    for L in range(1, order):
        out.append(((2 * L + 1) / (L + 1)) * u * out[-1] - (L / (L + 1)) * out[-2])
    return jnp.stack(out[: order + 1], axis=0)
