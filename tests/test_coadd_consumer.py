"""PyIMCOM-style consumer of the L2 product contract.

The reference embeds a gwcs in the calibrated product precisely so that
the downstream coadder (PyIMCOM) can place every input pixel on its
output tangent plane from the file alone
(``gen_cal_image.py:653-662``).  These tests drive
``validation.coadd_consumer`` against synthetic L2 products built ONLY
from the documented contract surface (``roman.meta.wcsinfo`` flat SIP
cards + data/err/dq), with analytic ground truth:

- bilinear resampling is EXACT for an affine scene, so a plane in
  (ra, dec) must come back as the same plane on the output grid;
- DQ-flagged input samples are excluded and the surviving weights
  renormalized;
- off-detector output pixels have zero coverage;
- the CLI runs from just a path.

End-to-end consumption of a real pipeline product lives in
``test_workflow.py::test_l2_pyimcom_style_consumer``.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.ops import wcsutils
from romanimpreprocess_tpu.validation import coadd_consumer

N = 96
RA0, DEC0 = 37.25, -20.5


def _wcs(n=N):
    """A mildly distorted SIP TAN WCS, CRPIX at the array center."""
    return wcsutils.SIPWCS(
        crpix=[(n - 1) / 2.0, (n - 1) / 2.0],
        cd=[[-3.05e-5, 1.1e-6], [1.2e-6, 3.05e-5]],
        crval=[RA0, DEC0],
        a_coefs={(2, 0): 3.0e-7, (0, 2): -2.0e-7, (1, 1): 1.0e-7},
        b_coefs={(2, 0): -1.5e-7, (0, 2): 2.5e-7, (1, 1): -8.0e-8},
    )


def _l2_tree(data, dq=None, err=None, wcs=None):
    w = wcs or _wcs(data.shape[0])
    return {
        "roman": {
            "meta": {
                "wcsinfo": dict(
                    w.to_cards(), pixel_convention="0-based, active region"
                ),
            },
            "data": np.asarray(data, np.float32),
            "dq": (
                np.zeros(data.shape, np.uint32) if dq is None else dq
            ),
            "err": (
                np.zeros(data.shape, np.float32) if err is None else err
            ),
        }
    }


def _plane_scene(w, n=N):
    """data[y, x] = affine function of the LOCAL tangent-plane offsets."""
    X, Y = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    ra, dec = w.pix2world(X, Y)
    # gnomonic offsets from the field center, in arcsec (affine to 1e-9
    # over a 3' stamp, and exactly consistent between input and output
    # evaluation since both go through world coordinates)
    du = (ra - RA0) * np.cos(np.deg2rad(DEC0)) * 3600.0
    dv = (dec - DEC0) * 3600.0
    return 10.0 + 3.0 * du - 2.0 * dv, (du, dv)


def test_affine_scene_roundtrip():
    """Plane in sky coords -> bilinear resample -> same plane, <1e-4."""
    w = _wcs()
    data, _ = _plane_scene(w)
    l2 = coadd_consumer.L2Image(_l2_tree(data, wcs=w))
    grid = coadd_consumer.CoaddGrid(RA0, DEC0, scale=0.08, shape=(32, 32))
    res = coadd_consumer.resample(l2, grid)
    ra, dec = grid.world_grid()
    du = (ra - RA0) * np.cos(np.deg2rad(DEC0)) * 3600.0
    dv = (dec - DEC0) * 3600.0
    want = 10.0 + 3.0 * du - 2.0 * dv
    assert np.all(res["coverage"] > 0.999)
    assert np.abs(res["data"] - want).max() < 1e-4
    # variance propagation: err=0 everywhere -> var 0
    assert np.nanmax(res["var"]) == 0.0


def test_consumer_uses_only_the_file():
    """Write the product to disk, reopen via open_l2: same answer."""
    import tempfile

    w = _wcs()
    data, _ = _plane_scene(w)
    tree = _l2_tree(data, wcs=w)
    with tempfile.NamedTemporaryFile(suffix=".asdf") as f:
        asdf_lite.AsdfFile(tree).write_to(f.name)
        l2 = coadd_consumer.open_l2(f.name)
    grid = coadd_consumer.CoaddGrid(RA0, DEC0, scale=0.08, shape=(16, 16))
    a = coadd_consumer.resample(l2, grid)
    b = coadd_consumer.resample(
        coadd_consumer.L2Image(tree), grid
    )
    assert np.array_equal(a["data"], b["data"])
    assert np.array_equal(a["coverage"], b["coverage"])


def test_dq_masking_and_renormalization():
    w = _wcs()
    data, _ = _plane_scene(w)
    dq = np.zeros(data.shape, np.uint32)
    cy = cx = (N - 1) // 2
    dq[cy, cx] = 1  # flag one input pixel near the stamp center
    l2 = coadd_consumer.L2Image(_l2_tree(data, dq=dq, wcs=w))
    grid = coadd_consumer.CoaddGrid(RA0, DEC0, scale=0.08, shape=(24, 24))
    full = coadd_consumer.resample(
        coadd_consumer.L2Image(_l2_tree(data, wcs=w)), grid
    )
    masked = coadd_consumer.resample(l2, grid)
    # coverage dips exactly where the flagged sample carried weight...
    lost = full["coverage"] - masked["coverage"]
    assert lost.max() > 0.05
    assert lost.min() >= -1e-12
    # ...but the renormalized values stay within one input pixel's
    # worth of scene gradient (|grad| ~ sqrt(13)/arcsec * 0.11"/px)
    # of the affine scene, and remain exact away from the hole
    ra, dec = grid.world_grid()
    du = (ra - RA0) * np.cos(np.deg2rad(DEC0)) * 3600.0
    dv = (dec - DEC0) * 3600.0
    want = 10.0 + 3.0 * du - 2.0 * dv
    dev = np.abs(masked["data"] - want)
    assert dev.max() < np.hypot(3.0, 2.0) * 0.115
    assert dev[lost < 1e-12].max() < 1e-4
    # dq_mask that ignores the flagged bit restores full coverage
    unmasked = coadd_consumer.resample(l2, grid, dq_mask=0xFFFFFFFE)
    assert np.allclose(unmasked["coverage"], full["coverage"])


def test_off_detector_zero_coverage():
    w = _wcs()
    data, _ = _plane_scene(w)
    l2 = coadd_consumer.L2Image(_l2_tree(data, wcs=w))
    # center the stamp one detector-width east: mostly off-chip
    ra_off = RA0 + N * 3.05e-5 * 1.5 / np.cos(np.deg2rad(DEC0))
    grid = coadd_consumer.CoaddGrid(ra_off, DEC0, scale=0.11, shape=(16, 16))
    res = coadd_consumer.resample(l2, grid)
    assert np.all(res["coverage"] == 0.0)
    assert np.all(np.isnan(res["data"]))


def test_variance_propagation():
    """Constant err=2 -> var = 4 * sum(w^2)/(sum w)^2 in [4/2, 4]*cov."""
    w = _wcs()
    data, _ = _plane_scene(w)
    err = np.full(data.shape, 2.0, np.float32)
    l2 = coadd_consumer.L2Image(_l2_tree(data, err=err, wcs=w))
    grid = coadd_consumer.CoaddGrid(RA0, DEC0, scale=0.08, shape=(16, 16))
    res = coadd_consumer.resample(l2, grid)
    v = res["var"]
    # bilinear: sum w = 1, sum w^2 in [1/4, 1]
    assert np.nanmin(v) >= 4.0 / 4 - 1e-9
    assert np.nanmax(v) <= 4.0 + 1e-9


def test_no_wcsinfo_raises():
    tree = _l2_tree(np.zeros((8, 8), np.float32))
    del tree["roman"]["meta"]["wcsinfo"]
    with pytest.raises(ValueError, match="wcsinfo"):
        coadd_consumer.L2Image(tree)


def test_cli(tmp_path, capsys):
    w = _wcs()
    data, _ = _plane_scene(w)
    path = str(tmp_path / "L2.asdf")
    asdf_lite.AsdfFile(_l2_tree(data, wcs=w)).write_to(path)
    out = str(tmp_path / "stamp.fits")
    rc = coadd_consumer.main([path, "--n", "12", "--scale", "0.1", "--out", out])
    assert rc == 0
    assert "coverage 1.000" in capsys.readouterr().out
    from romanimpreprocess_tpu.io import fits_lite

    with fits_lite.open_fits(out) as hdus:
        assert hdus[0].data.shape == (12, 12)
        assert "CRVAL1" in hdus[0].header
