"""Pathological-input behavior of the calibration core.

Production sweeps hit broken detectors/exposures; the core must
degrade to flagged-but-finite outputs, never crash or emit NaN science
values (the diagnostic ``medsky`` may be NaN when nothing is usable —
the mode of an empty histogram).
"""

import numpy as np

import jax.numpy as jnp

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.dqflags import pixel
from romanimpreprocess_tpu.pipeline import l1_to_l2


def _run(**overrides):
    arr, plan, cfg, geom = benchlib.core_bundle(nside=64)
    arr = dict(arr, **overrides)
    core = l1_to_l2._get_core(plan, cfg, geom)
    out = core({k: jnp.asarray(v) for k, v in arr.items()})
    return arr, {k: np.asarray(v) for k, v in out.items()}


def test_all_saturated_exposure_degrades_cleanly():
    arr, out = _run(
        data=np.full((6, 64, 64), 65535, np.uint16)
    )
    act = (slice(4, -4), slice(4, -4))
    assert np.isfinite(out["slope"]).all()
    assert np.isfinite(out["slope_err_read"]).all()
    assert np.isfinite(out["slope_err_poisson"]).all()
    # every active pixel unusable, and the endslice map says "no good
    # resultants" everywhere
    dnu = (out["pdq"][act] & np.uint32(pixel.DO_NOT_USE)) != 0
    assert dnu.all()
    assert (out["endslice"] <= 0).all()


def test_fully_masked_frame_degrades_cleanly():
    arr, out = _run(
        mask_dq=np.full((64, 64), pixel.DO_NOT_USE, np.uint32)
    )
    assert np.isfinite(out["slope"]).all()
    assert np.isfinite(out["skycoefs"]).all()
    # the smooth-mode sky diagnostic has no usable pixels -> NaN is the
    # documented degradation (empty histogram), not a crash
    assert np.isnan(out["medsky"]) or np.isfinite(out["medsky"])


def test_bad_cal_region_is_flagged_and_rest_stays_finite():
    # a dead quadrant in the gain/flat planes: like the reference, the
    # science values THERE may blow up (no silent clipping of cal
    # data), but every such pixel carries NO_GAIN_VALUE/NO_FLAT_FIELD
    # (-> DO_NOT_USE in mask building) and the rest of the frame is
    # untouched and finite
    arr0, plan, cfg, geom = benchlib.core_bundle(nside=64)
    gain = np.asarray(arr0["gain"], np.float32).copy()
    flat = np.asarray(arr0["flat"], np.float32).copy()
    bad = np.zeros((64, 64), bool)
    bad[8:24, 8:24] = True
    gain[bad] = 0.0
    flat[bad] = 0.0
    arr, out = _run(gain=gain, flat=flat)
    act = (slice(4, -4), slice(4, -4))
    flagged = (
        out["pdq"] & np.uint32(pixel.NO_GAIN_VALUE | pixel.NO_FLAT_FIELD)
    ) != 0
    assert flagged[bad].all()
    good = ~flagged[act] & ~(
        (out["pdq"][act] & np.uint32(pixel.DO_NOT_USE)) != 0
    )
    assert np.isfinite(out["slope"][act][good]).all()
    assert np.isfinite(out["slope_err_read"][act][good]).all()
