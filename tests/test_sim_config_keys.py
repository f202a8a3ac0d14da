"""Sim-side config keys: CNORM throughput scale and NO_AMP33.

Reference: ``docs/from_sim_README.rst:58-60`` — CNORM multiplies the
scene's effective throughput; NO_AMP33 in the CALDIR dict bypasses the
reference-output information (``sim_to_isim.py:695-723``).
"""

import numpy as np

from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
N = 128
NA = N - 8


def _reads():
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    return reads


def test_cnorm_scales_scene_linearly(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=4)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    rates = {}
    for c in (1.0, 2.0, 3.0):
        x = sim_to_l1.run_config(
            {"IN": scene, "OUT": d + f"/L1_{c}.asdf", "READS": _reads(),
             "CALDIR": caldir, "SEED": 200, "CNORM": c}
        )
        rates[c] = np.asarray(x.truth_rate, np.float64)
    # rate_e = clip(C*scene + sky + dark): linear in C wherever positive
    d21 = rates[2.0] - rates[1.0]
    d32 = rates[3.0] - rates[2.0]
    pos = rates[1.0] > 0
    assert d21[pos].sum() > 0  # the scene contributes
    assert np.allclose(d32[pos], d21[pos], rtol=1e-5, atol=1e-7)


def test_no_amp33_bypasses_reference_output(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=2)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1_with.asdf", "READS": _reads(),
         "CALDIR": dict(caldir), "SEED": 200}
    )
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1_no.asdf", "READS": _reads(),
         "CALDIR": dict(caldir, NO_AMP33=True), "SEED": 200}
    )
    r_with = asdf_lite.open(d + "/L1_with.asdf")["roman"]
    r_no = asdf_lite.open(d + "/L1_no.asdf")["roman"]
    # with the reference output the L1 carries the amp33 block;
    # bypassed, it is omitted entirely (reference sim_to_isim.py:723
    # only attaches amp33 when NO_AMP33 is absent)
    assert "amp33" in r_with
    assert "amp33" not in r_no
    assert np.asarray(r_with["amp33"]).mean() > 50.0  # med level present
