"""End-to-end likelihood-fit path test (romancal_ramp_fit=True).

Mirrors the reference's romancal-likelihood checks
(``test_workflow.py:573-580, 670-705``): the L2 output carries dumo and
chisq, and the two fitters agree on common good pixels.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.dqflags import pixel
from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import l1_to_l2, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8


def test_likelihood_path_end_to_end(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=5)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 200}
    )
    base = {
        "IN": d + "/L1.asdf", "FITSWCS": d + "/L1_asdf_wcshead.txt",
        "CALDIR": caldir, "SKYORDER": 2,
    }
    l1_to_l2.calibrateimage(dict(base, OUT=d + "/L2.asdf"))
    l1_to_l2.calibrateimage(
        dict(base, OUT=d + "/L2rc.asdf", romancal_ramp_fit=True,
             REJECTION_THRESHOLD=5.0, correct_wfi18_transient=True)
    )

    a = asdf_lite.open(d + "/L2.asdf")["roman"]
    rc = asdf_lite.open(d + "/L2rc.asdf")["roman"]
    assert rc["data"].shape == (NA, NA)
    assert "dumo" in rc and "chisq" in rc
    assert rc["dumo"].dtype == np.float16
    assert rc["chisq"].dtype == np.float16
    # WFI18 correction marked N/A for this detector
    assert rc["meta"]["cal_step"]["wfi18_transient"] == "N/A"

    good = (np.asarray(a["dq"]) == 0) & (np.asarray(rc["dq"]) == 0)
    assert good.mean() > 0.7
    data_c = np.asarray(a["data"])
    data_l = np.asarray(rc["data"])
    err_c = np.asarray(a["err"])
    err_l = np.asarray(rc["err"])
    assert np.isfinite(data_l[good]).all()

    # median uncertainties comparable (reference: within 5%; allow 15%)
    ratio = np.median(err_l[good]) / np.median(err_c[good])
    assert 0.8 < ratio < 1.15, ratio
    # mad-std of the normalized difference small (reference: < 0.05)
    z = (data_l - data_c)[good] / np.maximum(err_c[good], 1e-5)
    mad = np.median(np.abs(z - np.median(z))) * 1.4826
    assert mad < 0.25, mad
    # cosmic-ray counts comparable
    j_c = ((np.asarray(a["dq"]) & pixel.JUMP_DET) != 0).sum()
    j_l = ((np.asarray(rc["dq"]) & pixel.JUMP_DET) != 0).sum()
    assert j_l > 0
    assert 0.2 * j_c < j_l < 5 * max(j_c, 1), (j_c, j_l)
