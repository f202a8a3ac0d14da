"""Full-scale (4096^2) end-to-end validation on real TPU hardware.

Opt-in: ``ROMAN_TPU_FULL=1 python -m pytest tests/test_fullscale_tpu.py``.
Asserts the reference's full-size gates: cosmic-ray JUMP_DET count in
[10k, 30k] for a 139.8 s exposure (test_workflow.py:624-627) and slope
recovery of the truth scene.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ROMAN_TPU_FULL") != "1",
    reason="full-scale TPU run (set ROMAN_TPU_FULL=1)",
)


def test_fullscale_sim_l1_l2(tmp_path):
    import jax

    jax.config.update("jax_platforms", "")  # let the TPU register

    from romanimpreprocess_tpu.dqflags import pixel
    from romanimpreprocess_tpu.io import asdf_lite, calfiles, fits_lite
    from romanimpreprocess_tpu.pipeline import l1_to_l2, sim_to_l1
    from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

    d = str(tmp_path)
    rp = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
    reads = []
    for g in rp:
        reads += [g[0], g[-1] + 1]
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=4088,
                            nstars=25)
    caldir = make_cal_files(d + "/roman_wfi", rp, nside=4096, seed=5,
                            channelwidth=128)
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 200}
    )
    c2 = {
        "IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True,
        "JUMP_DETECT_PARS": {"SthreshA": 10.0, "SthreshB": 4.5,
                             "IthreshA": 0.6, "IthreshB": 600.0},
    }
    l1_to_l2.calibrateimage(c2)

    r = asdf_lite.open(d + "/L2.asdf")["roman"]
    dq = np.asarray(r["dq"])
    ncr = int(((dq & pixel.JUMP_DET) != 0).sum())
    # reference envelope for a 139.8 s exposure at 4088^2
    assert 10_000 < ncr < 30_000, ncr

    pack = calfiles.load_caldir(caldir)
    truth = fits_lite.open_fits(scene)[0].data[::-1, :]
    expected = truth / pack.gain[4:-4, 4:-4] / 139.8
    good = dq == 0
    x = np.where(good, np.asarray(r["data_withsky"]) - expected, 0.0)
    assert (np.abs(x) > 100).sum() < 50  # reference gate
    assert 0.1 < np.median(x[good]) < 0.5  # sky level
