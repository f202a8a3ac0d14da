"""Noise-engine tests: R/O/P/S layers on the small end-to-end fixture.

Mirrors the reference's noise-layer IQR gates
(``test_workflow.py:750-779``), scaled to the 128^2 geometry.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import l1_to_l2, noise, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
N = 128
NA = N - 8


@pytest.fixture(scope="module")
def noisedir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nz"))
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA, nstars=5)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 200}
    )
    c2 = {
        "IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True,
        "NOISE": {
            "LAYER": ["Rz4S2C1", "O", "Prb2"],
            "SEED": 10000,
            "OUT": d + "/L2_noise.asdf",
        },
    }
    l1_to_l2.calibrateimage(c2)
    noise.generate_all_noise(c2)
    return d, c2


def test_noise_cube_shape_and_layers(noisedir):
    d, c2 = noisedir
    a = asdf_lite.open(d + "/L2_noise.asdf")
    adata = np.asarray(a["noise"])
    assert adata.shape == (3, NA, NA)
    assert adata.dtype == np.float32

    l2 = asdf_lite.open(d + "/L2.asdf")
    good = np.asarray(l2["roman"]["dq"]) == 0

    # R layer: read-noise realization, IQR ~ read-noise slope error
    x0 = adata[0][good]
    spread0 = np.percentile(x0, 95) - np.percentile(x0, 5)
    assert 0.3 < spread0 < 3.0, spread0
    assert abs(np.median(x0)) < 0.3

    # O layer (Pearson pseudo-Poisson): scales with the signal
    x1 = adata[1][good]
    spread1 = np.percentile(x1, 95) - np.percentile(x1, 5)
    assert 0.03 < spread1 < 3.0, spread1

    # P layer (resampled Poisson of the sky): nonzero, small
    x2 = adata[2][good]
    spread2 = np.percentile(x2, 95) - np.percentile(x2, 5)
    assert 0.01 < spread2 < 3.0, spread2

    # all layers are noise (no large deterministic offset)
    for j in range(3):
        assert abs(np.median(adata[j][good])) < 0.5


def test_noise_poisson_layer_tracks_signal(noisedir):
    """The 'O' pseudo-Poisson layer variance should grow with intensity."""
    d, c2 = noisedir
    a = asdf_lite.open(d + "/L2_noise.asdf")
    l2 = asdf_lite.open(d + "/L2.asdf")
    sig = np.asarray(l2["roman"]["data_withsky"])
    x = np.asarray(a["noise"][1])
    good = np.asarray(l2["roman"]["dq"]) == 0
    hi = good & (sig > np.percentile(sig, 95))
    lo = good & (sig < np.percentile(sig, 50))
    assert x[hi].std() > 1.5 * x[lo].std()


def test_noise_o_layer_backends_agree(noisedir, tmp_path):
    """The device (jax) and host Pearson backends produce 'O' layers
    with matching spread (same tilde-nus, same endslice classes)."""
    d, c2 = noisedir
    l2 = asdf_lite.open(d + "/L2.asdf")
    good = np.asarray(l2["roman"]["dq"]) == 0
    spreads = {}
    for backend in ("jax", "host"):
        c3 = dict(c2)
        c3["NOISE"] = dict(
            c2["NOISE"], LAYER=["O"], PEARSON_BACKEND=backend,
            OUT=str(tmp_path / f"o_{backend}.asdf"),
        )
        cube = noise.make_noise_cube(c3)
        x = cube[0][good]
        spreads[backend] = np.percentile(x, 95) - np.percentile(x, 5)
        assert abs(np.median(x)) < 0.3
    ratio = spreads["jax"] / spreads["host"]
    assert 0.9 < ratio < 1.1, spreads


def test_noise_device_and_host_backends_agree(noisedir, tmp_path):
    """The default device-resident backend (staged runner; no silent
    fallback with device-strict) and the host engine produce layer
    cubes with matching spread on every layer type."""
    d, c2 = noisedir
    l2 = asdf_lite.open(d + "/L2.asdf")
    good = np.asarray(l2["roman"]["dq"]) == 0
    cubes = {}
    for backend in ("device-strict", "host"):
        c3 = dict(c2)
        c3["NOISE"] = dict(
            c2["NOISE"], BACKEND=backend,
            OUT=str(tmp_path / f"b_{backend}.asdf"),
        )
        cubes[backend] = noise.make_noise_cube(c3)
    for j in range(len(c2["NOISE"]["LAYER"])):
        xd = cubes["device-strict"][j][good]
        xh = cubes["host"][j][good]
        sd = np.percentile(xd, 95) - np.percentile(xd, 5)
        sh = np.percentile(xh, 95) - np.percentile(xh, 5)
        assert 0.75 < sd / sh < 1.33, (j, sd, sh)
        assert abs(np.median(xd)) < 0.3


def test_noise_device_deterministic_per_seed(noisedir, tmp_path):
    d, c2 = noisedir
    c3 = dict(c2)
    c3["NOISE"] = dict(c2["NOISE"], BACKEND="device-strict",
                       OUT=str(tmp_path / "det.asdf"))
    c1 = noise.make_noise_cube(c3)
    c2_ = noise.make_noise_cube(c3)
    assert np.array_equal(c1, c2_)
    c3["NOISE"]["SEED"] = int(c3["NOISE"]["SEED"]) + 1
    assert not np.array_equal(c1, noise.make_noise_cube(c3))


def test_noise_strict_rejects_host_pearson(noisedir, tmp_path):
    """device-strict + PEARSON_BACKEND host is contradictory (the host
    sampler only exists in the host engine) and must raise, not
    silently run the host path."""
    import pytest

    d, c2 = noisedir
    c3 = dict(c2)
    c3["NOISE"] = dict(c2["NOISE"], BACKEND="device-strict",
                       PEARSON_BACKEND="host",
                       OUT=str(tmp_path / "bad.asdf"))
    with pytest.raises(ValueError, match="device-strict"):
        noise.make_noise_cube(c3)


def test_noise_pearson_backend_case_insensitive(noisedir, tmp_path):
    """'Host' must select the host Pearson sampler exactly like
    'host' (the dispatch lowercases; the engine must too)."""
    d, c2 = noisedir
    cubes = {}
    for backend in ("host", "Host"):
        c3 = dict(c2)
        c3["NOISE"] = dict(
            c2["NOISE"], LAYER=["O"], PEARSON_BACKEND=backend,
            OUT=str(tmp_path / f"ci_{backend}.asdf"),
        )
        cubes[backend] = noise.make_noise_cube(c3)
    assert np.array_equal(cubes["host"], cubes["Host"])


def test_noise_precision16(noisedir, tmp_path):
    d, c2 = noisedir
    c3 = dict(c2)
    c3["NOISE"] = dict(c2["NOISE"], OUT=str(tmp_path / "n16.asdf"))
    c3["NOISE_PRECISION"] = 16
    noise.generate_all_noise(c3)
    a16 = asdf_lite.open(str(tmp_path / "n16.asdf"))
    assert np.asarray(a16["noise"]).dtype == np.float16
    a32 = asdf_lite.open(d + "/L2_noise.asdf")
    diff = (
        np.asarray(a16["noise"][0], np.float32) - np.asarray(a32["noise"][0])
    ) / (1.0 + np.abs(np.asarray(a32["noise"][0])))
    assert np.all(np.abs(diff) < 0.005)


def test_noise_bad_precision_raises(noisedir, tmp_path):
    d, c2 = noisedir
    c3 = dict(c2, NOISE_PRECISION=-1)
    c3["NOISE"] = dict(c2["NOISE"], OUT=str(tmp_path / "bad.asdf"))
    with pytest.raises(ValueError, match="Unsupported noise precision."):
        noise.generate_all_noise(c3)


def test_noise_requires_sliceout(noisedir, tmp_path):
    d, c2 = noisedir
    # base L2 without SLICEOUT -> endslice missing -> clear error
    c4 = dict(c2, OUT=str(tmp_path / "L2ns.asdf"), SLICEOUT=False)
    l1_to_l2.calibrateimage(c4)
    c4["NOISE"] = dict(c2["NOISE"], OUT=str(tmp_path / "n.asdf"))
    with pytest.raises(ValueError, match="SLICEOUT"):
        noise.generate_all_noise(c4)
