"""Image2D_from_L1 pseudocalibrate shortcut test."""

import numpy as np
import pytest

from romanimpreprocess_tpu.io import calfiles, fits_lite
from romanimpreprocess_tpu.pipeline import sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8


def test_pseudocalibrate(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA, nstars=4)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 77}
    )
    h = fits_lite.Header.fromstring(open(d + "/L1_asdf_wcshead.txt").read())
    with sim_to_l1.Image2D_from_L1(d + "/L1.asdf", caldir, thewcs=h) as x:
        af2 = x.pseudocalibrate()
    slope = np.asarray(af2["roman"]["data"])
    assert slope.shape == (NA, NA)
    pack = calfiles.load_caldir(caldir)
    truth = fits_lite.open_fits(scene)[0].data[::-1, :]
    expected = truth / pack.gain[4:-4, 4:-4] / 139.8
    resid = slope - expected
    # median residual ~ sky through flat (no sky subtraction here)
    assert 0.1 < np.median(resid) < 0.8
    assert (np.abs(resid) > 10).mean() < 0.01


def test_pseudocalibrate_bad_wcs(tmp_path):
    d = str(tmp_path)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA, nstars=2)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 77}
    )
    with sim_to_l1.Image2D_from_L1(d + "/L1.asdf", caldir, thewcs=12345) as x:
        with pytest.raises(ValueError, match="Unrecognized WCS"):
            x.pseudocalibrate()


def test_make_ideal_l2_prefill_and_extract_ref(tmp_path):
    """make_ideal_l2 must build from the PRE-fill float cube (reference
    af2 semantics, ``sim_to_isim.py:745-754``): under EXTRACT_REF the
    stored L1 data is per-pixel offset-shifted, which would bias the
    nonlinear inversion.  The ideal slope must recover the injected
    scene in both modes and agree between them."""
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=4)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    slopes = {}
    for name, extra in (("plain", {}),
                        ("extract", {"EXTRACT_REF":
                                     {"data_encoding_offset": 4000}})):
        x = sim_to_l1.run_config(
            {"IN": scene, "OUT": d + f"/L1_{name}.asdf", "READS": reads,
             "CALDIR": caldir, "SEED": 77, **extra}
        )
        af2 = x.make_ideal_l2(caldir)
        slopes[name] = np.asarray(af2["roman"]["data"])
        assert slopes[name].shape == (NA, NA)
    pack = calfiles.load_caldir(caldir)
    truth = fits_lite.open_fits(scene)[0].data[::-1, :]
    expected = truth / pack.gain[4:-4, 4:-4] / 139.8
    for name, slope in slopes.items():
        resid = slope - expected
        assert 0.1 < np.median(resid) < 0.8, (name, np.median(resid))
        assert (np.abs(resid) > 10).mean() < 0.01, name
    # same seed, same pre-fill cube -> identical ideal slopes
    np.testing.assert_allclose(slopes["plain"], slopes["extract"],
                               rtol=1e-5, atol=1e-4)
