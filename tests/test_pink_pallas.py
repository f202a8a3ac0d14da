"""Gates for the fused Pallas pink-noise transform (ops.pink_pallas).

The fused kernel must agree with the XLA MXU Cooley-Tukey path
(``ops.pink._fft_ct``) to bf16 evaluation-path tolerance — both are
bf16-input/f32-accumulation renderings of the same transform, each
inside the documented <0.5% envelope of the exact spectrum (see
``ops/pink.py`` module docstring; reference construction:
``from_sim/sim_to_isim.py:265-303``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romanimpreprocess_tpu.ops import pink
from romanimpreprocess_tpu.ops.pink_pallas import pink_frames_fused

# smallest geometry on the MXU path: length = 2*256*128 = 2^17... use
# nside=256, cw=128 -> length 65536 = pink.MXU_MIN_LENGTH
NSIDE, CW = 256, 128
NFRAMES = 5


def _key(i):
    return jax.random.key(i, impl="rbg")


def test_fused_matches_xla_mxu_path():
    a = np.asarray(pink.pink_frames(_key(7), NFRAMES, NSIDE, CW))
    b = np.asarray(
        pink_frames_fused(_key(7), NFRAMES, NSIDE, CW, interpret=True))
    assert b.shape == a.shape
    s = a.std()
    d = np.abs(a - b)
    # same white spectra, same cast points: differences are bf16
    # rounding along the two evaluation orders
    assert d.std() < 0.01 * s
    assert d.max() < 0.05 * s


def test_fused_zero_mean_per_frame():
    b = np.asarray(
        pink_frames_fused(_key(3), NFRAMES, NSIDE, CW, interpret=True))
    flat = b.reshape(NFRAMES, -1)
    assert np.abs(flat.mean(axis=1)).max() < 1e-3 * flat.std()


def test_fused_spectral_slope():
    """Mean periodogram of the fused frames follows 1/f (log-log slope
    ~ -1 over two decades)."""
    b = np.asarray(
        pink_frames_fused(_key(11), 8, NSIDE, CW, interpret=True))
    flat = b.reshape(8, -1)
    p = (np.abs(np.fft.rfft(flat, axis=1)) ** 2).mean(axis=0)
    k = np.arange(len(p))
    sel = slice(2, 2000)
    slope = np.polyfit(np.log(k[sel]), np.log(p[sel] + 1e-30), 1)[0]
    assert abs(slope + 1.0) < 0.1


def test_pink_frames_pallas_flag_ignored_below_mxu_threshold():
    # below MXU_MIN_LENGTH the irfft path runs regardless of the flag
    a = np.asarray(pink.pink_frames(_key(5), 3, 64, 8))
    b = np.asarray(pink.pink_frames(_key(5), 3, 64, 8, pallas=True))
    np.testing.assert_array_equal(a, b)


def test_fill_core_pink_pallas_cache_key_distinct():
    """pink_pallas must be part of the fill-core cache identity (a
    shared core would silently serve the wrong backend)."""
    from romanimpreprocess_tpu.pipeline import sim_to_l1

    c1 = sim_to_l1._fill_core_factory((1, 2), 64, 8, 4, True, False,
                                      im_is_active=True)
    c2 = sim_to_l1._fill_core_factory((1, 2), 64, 8, 4, True, False,
                                      im_is_active=True, pink_pallas=True)
    assert c1 is not c2
