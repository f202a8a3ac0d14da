"""Calibration-production subsystem tests.

Closes the production loop at small geometry: synthetic raw frames ->
convert -> dark/read builders (+ solid-waffle-format inputs) -> gain/ipc
builders -> pflat/saturation/biascorr -> mask -> the produced CALDIR
calibrates an exposure end to end.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu import pars
from romanimpreprocess_tpu.calib import (
    convert,
    make_dark,
    make_gain,
    makemask,
    postprocess,
    swconfig,
)
from romanimpreprocess_tpu.io import asdf_lite, fits_lite
from romanimpreprocess_tpu.synth import make_cal_files

READS = [0, 1, 1, 3, 3, 6, 6, 9, 9, 11]
READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
N = 128
NB = 4
CW = N // 32
NAUG = N + CW
DT = 3.04


def _write_raw_frames(d, sca, nframes, rng, dark_slope, bias):
    """Per-frame raw FITS in the Detector frame."""
    paths = []
    for k in range(nframes):
        img = bias + dark_slope * DT * k + rng.normal(0, 6, (N, NAUG))
        frame = np.clip(np.round(img), 0, 65535).astype(np.uint16)
        # write in DETECTOR frame (undo the science flip for this sca)
        if sca % 3 == 0:
            frame[:, :N] = frame[:, N - 1 :: -1]
        else:
            frame = frame[::-1, :]
        h = fits_lite.Header()
        h["DATE"] = f"2026-01-01T00:00:{k:02d}"
        p = f"{d}/frame_{k:03d}.fits"
        fits_lite.PrimaryHDU(frame, header=h).writeto(p)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def production(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("calprod"))
    rng = np.random.RandomState(77)
    sca = 4
    dark_slope_true = 0.05 * 10.0 ** rng.normal(-0.3, 0.5, (N, NAUG))
    bias = 12000 + 100 * np.cos(np.arange(NAUG) / 17.0)[None, :]

    # ---- convert 4 dark exposures ----
    noise_files = []
    for e in range(1, 5):
        frames = _write_raw_frames(
            d + "/", sca, 12, np.random.RandomState(e), dark_slope_true, bias
        )
        out = f"{d}/99999999_SCA{sca:02d}_Noise_{e:03d}.fits"
        convert.convert_exposure(frames, out, sca, frame_time=DT)
        noise_files.append(out)

    # ---- solid-waffle noise summary (synthetic, reference format) ----
    planes = np.zeros((8, N, NAUG), np.float32)
    h = fits_lite.Header()
    h["DARK1"], h["DARK1ERR"], h["DARK2"], h["DARK2ERR"] = 0, 1, 2, 3
    h["CDS"], h["RESET"] = 4, 5
    h["ACN"], h["C_PINK"], h["U_PINK"] = 0.1, 0.8, 0.4
    planes[0] = dark_slope_true / DT  # DN/s (bright fit)
    planes[1] = 0.01
    planes[2] = dark_slope_true / DT
    planes[3] = 0.005
    planes[4] = 8.5  # CDS noise
    planes[5] = 27.0  # reset noise
    a33 = np.zeros((2, N, CW), np.float32)
    a33[0] = 29000.0
    a33[1] = 4.0
    ah = fits_lite.Header()
    ah["EXTNAME"] = "AMP33"
    ah["M_PINK"], ah["RU_PINK"] = 0.8, 1.0
    summary_path = d + "/noise_summary.fits"
    fits_lite.HDUList(
        [
            fits_lite.PrimaryHDU(),
            fits_lite.HDU(planes, header=h),
            fits_lite.HDU(a33, header=ah),
        ]
    ).writeto(summary_path)

    # settings yaml for the pattern name
    import yaml

    with open(d + "/settings_TESTPAT.yaml", "w") as f:
        yaml.safe_dump({"READS": READS}, f)

    dark_path = f"{d}/roman_wfi_dark_PROD_SCA{sca:02d}.asdf"
    make_dark.make_dark_and_read_files(
        "TESTPAT", READS, noise_files, summary_path, sca, dark_path, nside=N
    )

    # ---- solid-waffle gain summaries (synthetic tables) ----
    nsx = nsy = 8
    ncol = 12
    rows = []
    for iy in range(nsy):
        for ix in range(nsx):
            row = np.zeros(ncol)
            row[make_gain.SW_COLS["X"]] = ix
            row[make_gain.SW_COLS["Y"]] = iy
            row[make_gain.SW_COLS["N"]] = 100 if (ix, iy) != (3, 3) else 0
            row[make_gain.SW_COLS["g"]] = 1.5 + 0.01 * ix
            row[make_gain.SW_COLS["aH"]] = 0.013
            row[make_gain.SW_COLS["aV"]] = 0.015
            row[make_gain.SW_COLS["aD"]] = 0.002
            rows.append(row)
    tab = np.array(rows)
    sfiles = []
    for j in range(2):
        p = f"{d}/sw_summary_{j}.txt"
        np.savetxt(p, tab)
        sfiles.append(p)

    gain_path = f"{d}/roman_wfi_gain_PROD_SCA{sca:02d}.asdf"
    make_gain.make_gain_and_ipc_files(sfiles, sca, gain_path, nside=N)

    # ---- linearity file: reuse the synth generator's analytic model ----
    syn = make_cal_files(d + "/synsrc", READ_PATTERN, nside=N, seed=9,
                         tag="SYN", sca=sca)
    lin_path = syn["linearitylegendre"]

    pflat_path = f"{d}/roman_wfi_pflat_PROD_SCA{sca:02d}.asdf"
    postprocess.make_pflat_file(lin_path, gain_path, pflat_path, sca)
    sat_path = f"{d}/roman_wfi_saturation_PROD_SCA{sca:02d}.asdf"
    postprocess.make_saturation_file(lin_path, sat_path, sca)
    bias_path = f"{d}/roman_wfi_biascorr_PROD_SCA{sca:02d}.asdf"
    postprocess.make_biascorr_file(
        lin_path, dark_path, bias_path, sca, READS, frame_time=DT
    )
    mask_path = f"{d}/roman_wfi_mask_PROD_SCA{sca:02d}.asdf"
    makemask.make_mask_file(mask_path, sca, lin_path, dark_path,
                            gain_file=gain_path, nside=N)

    caldir = {
        "dark": dark_path,
        "read": dark_path.replace("_dark_", "_read_"),
        "gain": gain_path,
        "ipc4d": gain_path.replace("_gain_", "_ipc4d_"),
        "linearitylegendre": lin_path,
        "flat": pflat_path,
        "saturation": sat_path,
        "biascorr": bias_path,
        "mask": mask_path,
    }
    return d, sca, caldir, dark_slope_true


def test_group_exposures():
    """Exposure grouping follows the raw-campaign naming convention
    (reference convert_dark.py:23-48): group by the exp{j}_ token, drop
    guide-window frames (frame id not ending in hex), truncate to N."""
    files = []
    for j in (2, 1, 3):
        for k in range(4):
            files.append(f"/raw/Total_Noise_exp{j}_SCU07_000{k:x}.fits")
        files.append(f"/raw/Total_Noise_exp{j}_SCU07_gw.fits")  # dropped
    files.append("/raw/README.txt.fits-no-exp")  # no exp token -> dropped
    groups = convert.group_exposures(files, nframes=3)
    assert [g[0] for g in groups] == [1, 2, 3]
    for _, g in groups:
        assert len(g) == 3
        assert all("gw" not in f for f in g)
    # exposures shorter than nframes are skipped
    short = [f"/raw/D_exp9_SCU07_000{k:x}.fits" for k in range(2)]
    assert convert.group_exposures(short, nframes=3) == []
    # without nframes, full groups come back
    assert len(convert.group_exposures(files)[0][1]) == 4


def test_convert_roundtrip(production):
    d, sca, caldir, dark_slope_true = production
    hdus = fits_lite.open_fits(f"{d}/99999999_SCA{sca:02d}_Noise_001.fits")
    assert hdus[0].header["TGROUP"] == DT
    cube = hdus[1].data
    assert cube.shape == (1, 12, N, NAUG)
    # slope HDU recovers the dark slope (DN/frame)
    slp = hdus[2].data
    resid = slp[0] - dark_slope_true * DT / DT * DT  # DN/frame
    assert abs(np.median(resid)) < 1.0


def test_dark_file_contents(production):
    d, sca, caldir, dark_slope_true = production
    f = asdf_lite.open(caldir["dark"])["roman"]
    assert f["data"].shape == (5, N, N)
    assert f["meta"]["reftype"] == "DARK"
    # group-averaged dark matches bias + slope * tbar
    t2 = DT * np.mean(READ_PATTERN[2])
    expect = 12000 + 100 * np.cos(np.arange(N) / 17.0) + dark_slope_true[:, :N] * t2
    resid = f["data"][2] - expect
    assert np.abs(np.median(resid)) < 3.0
    assert np.isclose(
        np.median(f["dark_slope"]), np.median(dark_slope_true[:, :N]) / DT,
        rtol=0.05,
    )


def test_read_file_contents(production):
    d, sca, caldir, _ = production
    f = asdf_lite.open(caldir["read"])["roman"]
    assert np.allclose(f["data"], 8.5 / np.sqrt(2), atol=1e-4)
    assert np.allclose(f["resetnoise"], 27.0)
    assert f["anc"]["C_PINK"] == pytest.approx(0.8)
    assert f["amp33"]["valid"] is True
    assert f["amp33"]["M_PINK"] == pytest.approx(0.8)


def test_gain_and_ipc_files(production):
    d, sca, caldir, _ = production
    g = asdf_lite.open(caldir["gain"])["roman"]
    assert g["data"].shape == (N, N)
    inner = g["data"][NB:-NB, NB:-NB]
    assert 1.45 < np.median(inner) < 1.65
    # bad superpixel (3,3) flagged NO_GAIN_VALUE
    assert (g["dq"] == 2**19).sum() > 0

    k = asdf_lite.open(caldir["ipc4d"])["roman"]["data"]
    assert k.shape == (3, 3, N - 8, N - 8)
    s = k.sum(axis=(0, 1))
    assert np.allclose(s, 1.0, atol=1e-5)
    assert np.allclose(k[1, 0, 50, 50], 0.013, atol=1e-5)
    # edge zeroing: bottom row has no downward coupling
    assert np.all(k[0, :, 0, :] == 0)


def test_pflat_saturation_biascorr(production):
    d, sca, caldir, _ = production
    p = asdf_lite.open(caldir["flat"])["roman"]
    inner = p["data"][NB:-NB, NB:-NB]
    assert 0.5 < np.median(inner) < 1.5
    s = asdf_lite.open(caldir["saturation"])["roman"]
    lin = asdf_lite.open(caldir["linearitylegendre"])["roman"]
    assert np.allclose(
        s["data"], np.clip(lin["Smax"], 1, 65535) - 1, atol=1e-3
    )
    b = asdf_lite.open(caldir["biascorr"])["roman"]
    assert b["data"].shape == (5, N - 8, N - 8)
    assert b["t0"] == pytest.approx(DT * 1.5)
    # observed dark = bias + slope*t; the forward model is anchored at
    # Sref (= 0 DN_lin), so biascorr ~ bias - Sref
    expect = np.median(12000 - lin["Sref"][NB:-NB, NB:-NB])
    assert abs(np.median(b["data"]) - expect) < 300


def test_mask_file(production):
    d, sca, caldir, dark_slope_true = production
    m = asdf_lite.open(caldir["mask"])["roman"]["dq"]
    assert np.all(m[:4, :] & 2**31)
    # hot/warm from the dark slope
    hot = dark_slope_true[:, :N] / DT > 12.5
    if hot.any():
        assert np.all(m[hot] & 2**11)


def test_swconfig_emitters(tmp_path):
    txt, summary = swconfig.solid_waffle_config("/data", 7, 1, 10)
    assert "DETECTOR: SCA07" in txt
    assert "99999999_SCA07_Flat_010.fits" in txt
    assert "NBIN: 32 32" in txt
    assert summary.endswith("sw-SCA07-E001_summary.txt")
    import json

    cfg = json.loads(swconfig.linearity_config("/data", 7, "TAG"))
    assert cfg["SCA"] == 7
    assert cfg["P_ORDER"] == 10
    assert cfg["BIAS"]["SLICE"] == 1
    assert len(cfg["RAMPS"]) == 3


def test_produced_caldir_calibrates(production, tmp_path):
    """The full production loop closes: sim an exposure against the
    produced CALDIR and calibrate it back."""
    d, sca, caldir, _ = production
    from romanimpreprocess_tpu.pipeline import l1_to_l2, sim_to_l1
    from romanimpreprocess_tpu.synth import make_scene_file

    scene = make_scene_file(
        str(tmp_path / f"truth_F184_9_{sca}.fits"), nside_active=N - 8,
        nstars=4,
    )
    c1 = {"IN": scene, "OUT": str(tmp_path / "L1.asdf"), "READS": READS,
          "CALDIR": caldir, "SEED": 3}
    sim_to_l1.run_config(c1)
    c2 = {"IN": str(tmp_path / "L1.asdf"), "OUT": str(tmp_path / "L2.asdf"),
          "FITSWCS": str(tmp_path / "L1_asdf_wcshead.txt"),
          "CALDIR": caldir, "SKYORDER": 2}
    l1_to_l2.calibrateimage(c2)
    r = asdf_lite.open(str(tmp_path / "L2.asdf"))["roman"]
    good = r["dq"] == 0
    assert good.mean() > 0.5
    data = np.asarray(r["data"])
    assert np.isfinite(data[good]).all()
    # slope units sane: sky-subtracted background ~ 0
    assert abs(np.median(data[good])) < 1.0


def test_sigma_clip_mean_median_centered():
    """sigma_clip_mean must reproduce astropy's sigma_clip defaults
    (cenfunc='median', ddof=0 std, 5 iters) + nanmean — verified
    against a direct numpy implementation, including a cosmic-ray-like
    outlier that a MEAN-centered clip fails to reject."""
    import numpy as np

    from romanimpreprocess_tpu.calib.make_dark import sigma_clip_mean

    rng = np.random.default_rng(11)
    stack = rng.normal(1000.0, 5.0, (12, 6, 7)).astype(np.float32)
    stack[3, 2, 2] += 500.0   # CR hit: must be clipped
    stack[7, 0, 0] -= 300.0
    stack[5, 1, 1] = np.nan   # nanmean semantics

    def np_ref(a):
        a = a.copy()
        for _ in range(5):
            med = np.nanmedian(a, axis=0)
            std = np.nanstd(a, axis=0)  # ddof=0
            bad = (a < med - 3 * std) | (a > med + 3 * std)
            a[bad] = np.nan
        return np.nanmean(a, axis=0)

    got = np.asarray(sigma_clip_mean(stack))
    want = np_ref(stack.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-4)
    # the CR pixel's average must sit near the clean mean, not be
    # dragged ~40 DN upward as the unclipped (or mean-centered) stack is
    assert abs(got[2, 2] - np.mean(np.delete(stack[:, 2, 2], 3))) < 5.0


def test_cli_convert(tmp_path):
    """`calib.convert dark <indir> <n> <outdir> <sca>` mirrors the
    reference converter scripts (campaign naming, exposure grouping)."""
    d = str(tmp_path)
    rng = np.random.RandomState(3)
    dark = 0.05 * np.ones((N, NAUG))
    bias = 12000.0
    for e in (1, 2):
        for k in range(3):
            img = bias + dark * DT * k + rng.normal(0, 6, (N, NAUG))
            frame = np.clip(np.round(img), 0, 65535).astype(np.uint16)
            frame = frame[::-1, :]  # detector frame for sca=4
            fits_lite.PrimaryHDU(frame).writeto(
                f"{d}/Total_Noise_exp{e}_SCU04_000{k:x}.fits"
            )
    outdir = str(tmp_path / "out")
    import os

    os.makedirs(outdir)
    assert convert.main(["dark", d, "3", outdir, "4"]) == 0
    for e in (1, 2):
        f = fits_lite.open_fits(f"{outdir}/99999999_SCA04_Noise_{e:03d}.fits")
        assert f[1].data.shape == (1, 3, N, NAUG)
    # empty input dir -> rc 1
    assert convert.main(["flt", d, "3", outdir, "4"]) == 1


def test_cli_darkfile_and_gainfile(production, tmp_path):
    d, sca, caldir, _ = production
    out = str(tmp_path / f"roman_wfi_dark_CLI_SCA{sca:02d}.asdf")
    rc = make_dark.main([
        "TESTPAT", f"{d}/99999999_SCA{sca:02d}_Noise_001.fits",
        d + "/noise_summary.fits", str(sca), out,
        "--settings", d + "/settings_TESTPAT.yaml", "--nside", str(N),
    ])
    assert rc == 0
    r = asdf_lite.open(out)["roman"]
    assert np.asarray(r["data"]).shape[1:] == (N, N)

    lst = str(tmp_path / "summaries.txt")
    with open(lst, "w") as f:
        f.write(f"{d}/sw_summary_0.txt\n{d}/sw_summary_1.txt\n")
    gout = str(tmp_path / f"roman_wfi_gain_CLI_SCA{sca:02d}.asdf")
    assert make_gain.main([lst, str(sca), gout, "--nside", str(N)]) == 0
    g = asdf_lite.open(gout)["roman"]
    assert np.asarray(g["data"]).shape == (N, N)
    assert asdf_lite.open(gout.replace("_gain_", "_ipc4d_"))


def test_cli_postprocess_and_makemask(production, tmp_path):
    """The name-substitution CLIs (reference postprocess_calfiles.py /
    makemask.py derive every path from one argument)."""
    import shutil

    import yaml

    d, sca, caldir, _ = production
    w = str(tmp_path)
    base = f"{w}/roman_wfi_linearitylegendre_CLI_SCA{sca:02d}.asdf"
    shutil.copy(caldir["linearitylegendre"], base)
    shutil.copy(caldir["gain"], base.replace("_linearitylegendre_", "_gain_"))
    shutil.copy(caldir["dark"], base.replace("_linearitylegendre_", "_dark_"))
    with open(f"{w}/settings_TESTPAT.yaml", "w") as f:
        yaml.safe_dump({"READS": READS}, f)

    rc = postprocess.main([base, str(sca), "TESTPAT",
                           "--settings", f"{w}/settings_TESTPAT.yaml",
                           "--frame-time", str(DT)])
    assert rc == 0
    for kind in ("pflat", "saturation", "biascorr"):
        assert asdf_lite.open(base.replace("_linearitylegendre_", f"_{kind}_"))

    mout = base.replace("_linearitylegendre_", "_mask_")
    assert makemask.main([mout, str(sca), "--nside", str(N)]) == 0
    dq = np.asarray(asdf_lite.open(mout)["roman"]["dq"])
    assert dq.shape == (N, N) and dq.dtype == np.uint32
    assert np.all(dq[:NB, :] & 2**31)


def test_cli_swconfig(tmp_path, capsys):
    out = str(tmp_path / "sw.cfg")
    assert swconfig.main(["correlation", "/data", "7", "1", "10",
                          "--out", out]) == 0
    txt = open(out).read()
    assert "DETECTOR: SCA07" in txt and "FORMAT: 6" in txt
    assert "sw-SCA07-E001_summary.txt" in capsys.readouterr().out
    assert swconfig.main(["linearity", "/data", "7", "TAG"]) == 0
    import json

    cfg = json.loads(capsys.readouterr().out)
    assert cfg["SCA"] == 7
