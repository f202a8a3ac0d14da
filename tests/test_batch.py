"""Batch-driver test: directory scan, seed spacing, full per-exposure chain."""

import os

import numpy as np

from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import batch
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
READS = "0,1,1,3,3,6,6,9,9,11"
N = 128
NA = N - 8


def test_batch_run(tmp_path):
    d = str(tmp_path)
    os.makedirs(d + "/IN")
    make_scene_file(d + "/IN/Roman_Test_truth_F184_163_4.fits",
                    nside_active=NA, nstars=3)
    make_scene_file(d + "/IN/Roman_Test_truth_F184_164_4.fits",
                    nside_active=NA, nstars=3)
    make_scene_file(d + "/IN/Roman_Test_truth_F184_163_5.fits",
                    nside_active=NA, nstars=3)  # different SCA: skipped
    os.makedirs(d + "/CAL")
    make_cal_files(d + "/CAL/roman_wfi", READ_PATTERN, nside=N, seed=5,
                   tag="T", sca=4)
    os.makedirs(d + "/OUT", exist_ok=True)

    batch.run(
        [
            f"--in={d}/IN", f"--out={d}/OUT", f"--cal={d}/CAL", "--tag=T",
            "--sca=4", f"--reads={READS}", "--layers=Rz2S2C1", "--nmax=2",
        ]
    )

    for obsid in (163, 164):
        l2 = asdf_lite.open(d + f"/OUT/L2/sim_L2_F184_{obsid}_4.asdf")
        assert np.asarray(l2["roman"]["data"]).shape == (NA, NA)
        nz = asdf_lite.open(d + f"/OUT/L2/sim_L2_F184_{obsid}_4_noise.asdf")
        assert np.asarray(nz["noise"]).shape == (1, NA, NA)
        assert os.path.exists(d + f"/OUT/L2/sim_L2_F184_{obsid}_4_mask.fits")
    # SCA 5 not processed
    assert not os.path.exists(d + "/OUT/L2/sim_L2_F184_163_5.asdf")

    # seed spacing: the two exposures used different seeds -> different L1s
    a = asdf_lite.open(d + "/OUT/L1/sim_L1_F184_163_4.asdf")["roman"]["data"]
    b = asdf_lite.open(d + "/OUT/L1/sim_L1_F184_164_4.asdf")["roman"]["data"]
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_getval_and_findcal():
    argv = ["--in=/x", "--seed=77"]
    assert batch.getval(argv, "in") == "/x"
    assert batch.getval(argv, "seed") == "77"
    assert batch.getval(argv, "missing", "dflt") == "dflt"
    p = batch.findcal("/cal", "TAG", "flat", 7)
    assert p == "/cal/roman_wfi_pflat_TAG_SCA07.asdf"


def test_batch_fpa_matches_serial(tmp_path):
    """--fpa (one focal-plane batch per exposure: threaded sims, one
    mesh-sharded calibration, device noise) produces the same output
    files as the serial per-SCA loop: identical L1 (same seeds),
    bit-exact DQ, float maps to vmap reduction-order drift."""
    d = str(tmp_path)
    os.makedirs(d + "/IN")
    os.makedirs(d + "/CAL")
    for sca in (4, 5):
        make_scene_file(d + f"/IN/Roman_Test_truth_F184_163_{sca}.fits",
                        nside_active=NA, nstars=3)
        make_cal_files(d + "/CAL/roman_wfi", READ_PATTERN, nside=N,
                       seed=5, tag="T", sca=sca)
    args = [f"--in={d}/IN", f"--cal={d}/CAL", "--tag=T", "--sca=all",
            f"--reads={READS}", "--layers=Rz2S2C1"]
    batch.run(args + [f"--out={d}/OUT_S"])
    batch.run(args + [f"--out={d}/OUT_F", "--fpa"])

    for sca in (4, 5):
        stem = f"F184_163_{sca}"
        l1s = asdf_lite.open(d + f"/OUT_S/L1/sim_L1_{stem}.asdf")["roman"]
        l1f = asdf_lite.open(d + f"/OUT_F/L1/sim_L1_{stem}.asdf")["roman"]
        np.testing.assert_array_equal(np.asarray(l1s["data"]),
                                      np.asarray(l1f["data"]))
        l2s = asdf_lite.open(d + f"/OUT_S/L2/sim_L2_{stem}.asdf")["roman"]
        l2f = asdf_lite.open(d + f"/OUT_F/L2/sim_L2_{stem}.asdf")["roman"]
        # identical file STRUCTURE too: the schema-compat dummy fields
        # (typefix) must exist in both paths' products
        assert set(l2s.keys()) == set(l2f.keys())
        assert "chisq" in l2f and "dumo" in l2f
        assert "dummyfields" in l2f["meta"]
        np.testing.assert_array_equal(np.asarray(l2s["dq"]),
                                      np.asarray(l2f["dq"]))
        np.testing.assert_allclose(np.asarray(l2s["data"]),
                                   np.asarray(l2f["data"]),
                                   rtol=1e-3, atol=1e-4)
        nzs = np.asarray(
            asdf_lite.open(d + f"/OUT_S/L2/sim_L2_{stem}_noise.asdf")["noise"])
        nzf = np.asarray(
            asdf_lite.open(d + f"/OUT_F/L2/sim_L2_{stem}_noise.asdf")["noise"])
        assert nzs.shape == nzf.shape
        # same seed, same engine; the noise diff rides the (slightly
        # drifting) base L2, so gate statistically
        s_s = np.percentile(nzs, 95) - np.percentile(nzs, 5)
        s_f = np.percentile(nzf, 95) - np.percentile(nzf, 5)
        assert 0.8 < s_s / s_f < 1.25
        assert os.path.exists(d + f"/OUT_F/L2/sim_L2_{stem}_mask.fits")


def _scanned(nexp=3, scas=(4, 5)):
    return [
        (f"/in/x_F184_{163 + i}_{sca}.fits", "F184", 163 + i, sca)
        for i in range(nexp) for sca in scas
    ]


def test_plan_jobs_seed_lattice():
    """Seed sequence matches the reference driver: SCA k's i-th
    exposure draws L1 seed seed0 + dseed*(k + 2*i*NSCA) and noise seed
    one dseed*NSCA lattice step later (OpenUniverse_to_L1L2.py:49,108,
    141) — never a +1 offset, which could collide with another SCA's
    L1 seed."""
    inputs, jobs = batch.plan_jobs(
        _scanned(), output_dir="/o", cal_dir="/c", tag="T", seed=500,
        dseed=10, temp_dir="/t",
    )
    iexp = {}
    for (_, _, _, sca), (c1, c2) in zip(inputs, jobs):
        i = iexp.get(sca, 0)
        iexp[sca] = i + 1
        assert c1["SEED"] == 500 + 10 * (sca + 2 * i * batch.NSCA)
        assert c2["NOISE"]["SEED"] == c1["SEED"] + 10 * batch.NSCA
    all_seeds = [c1["SEED"] for c1, _ in jobs] + [
        c2["NOISE"]["SEED"] for _, c2 in jobs
    ]
    assert len(set(all_seeds)) == len(all_seeds)  # no collisions


def test_plan_jobs_nmax_per_sca():
    """--nmax bounds exposures PER SCA (the reference's Nmax truncates
    each single-SCA task's runlist) — a flat file-list cut with
    --sca=all would drop part of an exposure's focal plane."""
    inputs, jobs = batch.plan_jobs(
        _scanned(nexp=3, scas=(4, 5)), output_dir="/o", cal_dir="/c",
        tag="T", seed=500, dseed=10, temp_dir="/t", nmax=2,
    )
    got = sorted((obsid, sca) for _, _, obsid, sca in inputs)
    assert got == [(163, 4), (163, 5), (164, 4), (164, 5)]


def test_scan_inputs_case_insensitive(tmp_path):
    d = str(tmp_path)
    open(d + "/Roman_truth_F184_163_4.FITS", "w").close()
    open(d + "/Roman_truth_F184_164_4.fits", "w").close()
    out = batch.scan_inputs(d, [4])
    assert [(o, s) for _, _, o, s in out] == [(163, 4), (164, 4)]
