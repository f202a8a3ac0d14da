"""Saturation flagging for resultant cubes.

Replicates the semantics the reference gets from
``romancal.saturation.flag_saturation`` (called via
``gen_cal_image.saturation_check:148-185`` with ``n_pix_grow_sat=1``,
``backup`` resultants of retro-flagging, and the first ``skip_firstn``
resultants spliced out of the check):

1. a resultant is SATURATED where its value >= the saturation threshold
   (pixels whose saturation-reference dq carries NO_SAT_CHECK are never
   flagged, and get NO_SAT_CHECK in the pixel dq),
2. a resultant at or below the A/D floor (<= 0) gets AD_FLOOR|DO_NOT_USE,
3. saturation propagates forward in time (all later resultants of a
   saturated pixel are saturated),
4. ``backup`` additional resultants *before* the first saturated one are
   retro-flagged (pre-saturation charge spill),
5. the per-resultant saturated set grows spatially by ``n_pix_grow_sat``
   pixels (a (2n+1)^2 box dilation).

Everything is branch-free: forward propagation is a cumulative max over
the group axis, retro-flagging is a shifted cumulative max, and the
spatial grow is a max-pool (``lax.reduce_window``).
"""

import jax
import jax.numpy as jnp

from ..dqflags import group as gdq
from ..dqflags import pixel


def _dilate(mask, n):
    """Grow a boolean (ngrp, ny, nx) mask by an n-pixel box per group."""
    if n <= 0:
        return mask
    k = 2 * n + 1
    return jax.lax.reduce_window(
        mask,
        False,
        jax.lax.bitwise_or,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def flag_saturation(data, rdq, pdq, sat_thresh, sat_dq,
                    backup=1, skip_first=1, n_pix_grow_sat=1):
    """Flag saturated / A-D-floor resultants.

    Parameters
    ----------
    data : (ngrp, ny, nx) resultants (any real dtype, DN).
    rdq : (ngrp, ny, nx) uint32 group dq (updated copy returned).
    pdq : (ny, nx) uint32 pixel dq (updated copy returned).
    sat_thresh : (ny, nx) float32 saturation threshold (DN).
    sat_dq : (ny, nx) uint32 dq of the saturation reference file.
    backup : resultants to retro-flag before the first saturated one.
    skip_first : leading resultants excluded from the check entirely.
    n_pix_grow_sat : spatial grow radius of the saturated set.

    Returns (rdq_out, pdq_out).
    """
    ngrp = data.shape[0]
    no_check = (sat_dq & jnp.uint32(pixel.NO_SAT_CHECK)) != 0

    grp = jnp.arange(ngrp, dtype=jnp.int32)[:, None, None]
    checkable = grp >= skip_first

    sat = (data >= sat_thresh[None]) & ~no_check[None] & checkable
    floor = (data <= 0) & checkable

    # forward propagation: cumulative any over groups
    sat = jnp.cumsum(sat.astype(jnp.int32), axis=0) > 0
    # retro-flag `backup` earlier resultants: a group is flagged if any
    # of groups [g, g+backup] is saturated.  Shift the PRE-LOOP mask —
    # shifting the running result compounds the shifts (backup=2 would
    # retro-flag 2^2-1=3 groups) and, the mask being monotone in g,
    # silently widens every bright pixel's truncation.
    sat0 = sat
    for b in range(1, backup + 1):
        sat = sat | jnp.concatenate(
            [sat0[b:], jnp.zeros((b,) + sat0.shape[1:], dtype=bool)],
            axis=0,
        )
    # spatial grow
    sat = _dilate(sat, n_pix_grow_sat)
    # the grow/backup must not flag the skipped leading resultants
    sat = sat & checkable

    rdq_out = (
        rdq
        | jnp.where(sat, jnp.uint32(gdq.SATURATED), jnp.uint32(0))
        | jnp.where(
            floor, jnp.uint32(gdq.AD_FLOOR | gdq.DO_NOT_USE), jnp.uint32(0)
        )
    )
    pdq_out = pdq | jnp.where(
        no_check, jnp.uint32(pixel.NO_SAT_CHECK), jnp.uint32(0)
    )
    return rdq_out, pdq_out
