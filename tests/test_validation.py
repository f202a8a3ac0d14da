"""Monte-Carlo validation driver test: bias of the mean L2 vs truth."""

import numpy as np

from romanimpreprocess_tpu.io import calfiles
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file
from romanimpreprocess_tpu.validation.many_realizations import run_many

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
N = 128
NA = N - 8


def test_many_realizations(tmp_path):
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    c1 = {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
          "CALDIR": caldir, "SEED": 100}
    c2 = {"IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
          "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
          "SKYORDER": 2}
    stack = run_many(c1, c2, nrun=4, outfile=d + "/many.fits")
    assert stack.shape == (8, N, N)
    ideal, med_diff, med_img, count, mean, std, bias, med_err = stack
    inner = np.s_[20:-20, 20:-20]
    good = count[inner] >= 3
    # the L1 ramp accumulates (last group - group 1 diff is positive)
    assert np.median(med_diff[inner]) > 0
    # mean L2 is nearly unbiased vs the ideal slope where unmasked
    # (sky is subtracted; stars contribute the positive tail)
    b = bias[inner][good]
    assert abs(np.median(b)) < 0.3
    # reported error tracks the empirical std within a factor ~3
    ratio = np.median(med_err[inner][good]) / (np.median(std[inner][good]) + 1e-9)
    assert 0.3 < ratio < 4.0
    import os

    assert os.path.exists(d + "/many.fits")


def test_many_realizations_mesh(tmp_path):
    """Mesh-batched Monte-Carlo driver: realizations as sharded lanes
    over the 8-device mesh produce a stack with the same statistical
    content as the serial file-mediated driver (different RNG streams,
    same chain)."""
    from romanimpreprocess_tpu.validation.many_realizations import (
        run_many_mesh,
    )

    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    c1 = {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
          "CALDIR": caldir, "SEED": 100}
    c2 = {"IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
          "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
          "SKYORDER": 2}
    stack = run_many_mesh(c1, c2, nrun=8, outfile=d + "/many_mesh.fits")
    assert stack.shape == (8, N, N)
    ideal, med_diff, med_img, count, mean, std, bias, med_err = stack
    inner = np.s_[20:-20, 20:-20]
    good = count[inner] >= 6
    assert good.mean() > 0.8  # most pixels unmasked in most realizations
    assert np.median(med_diff[inner]) > 0  # the ramp accumulates
    assert np.isfinite(stack).all()
    b = bias[inner][good]
    assert abs(np.median(b)) < 0.3
    ratio = np.median(med_err[inner][good]) / (
        np.median(std[inner][good]) + 1e-9
    )
    assert 0.3 < ratio < 4.0
