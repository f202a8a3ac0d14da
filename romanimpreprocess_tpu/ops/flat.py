"""Flat-field handling (standalone API).

Equivalent of the reference's ``utils/flatutils.get_flat``
(``flatutils.py:20-76``): border padded with 1, out-of-range pixels
flagged NO_FLAT_FIELD and clipped to [0.1, 10], then IPC-deconvolved in
DN space (gain conjugation) with NO_GAIN_VALUE flagging.

The L1->L2 device core fuses this logic inline
(``pipeline/l1_to_l2.make_core``); this module is the standalone entry
for calibration QA and external consumers.
"""

import jax.numpy as jnp

from ..dqflags import pixel
from . import ipc


def get_flat(flat, gain=None, ipc_kernel=None, nborder=4, pdq=None,
             ipc_deconvolve=True):
    """Flat field in DN units with optional IPC deconvolution.

    Parameters
    ----------
    flat : (ny, nx) p-flat (full frame).
    gain : (ny, nx) e/DN (full frame), required when deconvolving.
    ipc_kernel : (3, 3, na, na) active-region kernel or None.
    pdq : optional (ny, nx) uint32 to OR quality flags into.

    Returns (flat_dn, pdq) — pdq is None if not supplied.
    """
    ny = flat.shape[0]
    nb = nborder
    out = jnp.ones((ny, ny), dtype=jnp.float32)
    out = out.at[nb : ny - nb, nb : ny - nb].set(flat[nb : ny - nb, nb : ny - nb])

    if pdq is not None:
        pdq = pdq | jnp.where(
            (out < 0.1) | (out > 10.0),
            jnp.uint32(pixel.NO_FLAT_FIELD), jnp.uint32(0),
        )
    out = jnp.clip(out, 0.1, 10.0)

    if ipc_deconvolve and ipc_kernel is not None:
        g = gain[nb : ny - nb, nb : ny - nb]
        if pdq is not None:
            pdq = pdq.at[nb : ny - nb, nb : ny - nb].set(
                pdq[nb : ny - nb, nb : ny - nb]
                | jnp.where(g <= 0.1, jnp.uint32(pixel.NO_GAIN_VALUE),
                            jnp.uint32(0))
            )
        g = jnp.clip(g, 0.1, None)
        out = out.at[nb : ny - nb, nb : ny - nb].set(
            ipc.ipc_rev(out[nb : ny - nb, nb : ny - nb], ipc_kernel, gain=g)
        )
    return out, pdq
