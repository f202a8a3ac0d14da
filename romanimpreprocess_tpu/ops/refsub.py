"""Reference-pixel subtraction (Laliotis et al. 2024 style).

Re-implements the reference's ``ref_subtraction_row`` /
``ref_subtraction_channel`` (``utils/reference_subtraction.py:16-125``),
replacing the Python loops over 4096 rows and 33 channels with
vectorized median reductions and closed-form line fits.

Both functions are pure (return the corrected image).
"""

import jax.numpy as jnp


def ref_subtraction_row(image, nside=4096, nborder=4, channelwidth=128,
                        use_ref_channel=False, slope=None):
    """Row-wise reference subtraction on a (nside, nside_augmented) frame.

    Per row: median of the active region and median of the reference
    region (left+right border columns, or the amp33 block when
    ``use_ref_channel``).  A straight line fit of active-median vs
    reference-median gives the coupling slope (unless ``slope`` is
    supplied, e.g. the optimal amp33 slope from the pink-noise model);
    ``slope * (ref_median - median(ref_median))`` is subtracted from
    each row.  Reference: ``reference_subtraction.py:77-125``.
    """
    image = jnp.asarray(image, jnp.float32)  # raw L1 frames are uint16
    nb = nborder
    sci_med = jnp.median(image[:, nb : nside - nb], axis=1)
    if use_ref_channel:
        ref_med = jnp.median(image[:, nside : nside + channelwidth], axis=1)
    else:
        ref = jnp.concatenate(
            [image[:, :nb], image[:, nside - nb : nside]], axis=1
        )
        ref_med = jnp.median(ref, axis=1)

    if slope is None:
        # closed-form 1-degree least squares of sci_med on ref_med
        rm = jnp.mean(ref_med)
        sm = jnp.mean(sci_med)
        m = jnp.sum((ref_med - rm) * (sci_med - sm)) / jnp.sum(
            (ref_med - rm) ** 2
        )
    else:
        m = slope
    ctr = jnp.median(ref_med)
    return image - (m * (ref_med - ctr))[:, None]


def ref_subtraction_channel(image, nside=4096, nborder=4, channelwidth=128,
                            use_ref_channel=False):
    """Channel-wise reference subtraction.

    For each readout channel (width ``channelwidth``; the amp33 block is
    channel 33 when ``use_ref_channel``): medians of the bottom and top
    ``nborder`` rows define a line across the rows, subtracted from
    every pixel of the channel.  Reference:
    ``reference_subtraction.py:16-74`` (the 2-point "least squares" there
    is the exact interpolating line).
    """
    # float up front: an integer input would otherwise wrap negative
    # corrected values through the .at[].set dtype cast below
    image = jnp.asarray(image, jnp.float32)
    ny, nxa = image.shape
    nch = nxa // channelwidth
    if not use_ref_channel:
        nch = min(nch, nside // channelwidth)

    block = image[:, : nch * channelwidth].reshape(ny, nch, channelwidth)
    nb = nborder
    bottom = jnp.median(
        block[:nb].transpose(1, 0, 2).reshape(nch, nb * channelwidth), axis=1
    )
    top = jnp.median(
        block[ny - nb :].transpose(1, 0, 2).reshape(nch, nb * channelwidth),
        axis=1,
    )
    y0 = (nb - 1) / 2.0
    y1 = ny - 1 - (nb - 1) / 2.0
    m = (top - bottom) / (y1 - y0)  # per-channel
    c = bottom - m * y0
    rows = jnp.arange(ny, dtype=image.dtype)
    correction = m[None, :] * rows[:, None] + c[None, :]  # (ny, nch)
    block = block - correction[:, :, None]
    out = image.at[:, : nch * channelwidth].set(block.reshape(ny, -1))
    return out
