"""SIP WCS, pixel area, and detector->science flip tests.

Mirrors the reference's ``test_area.py`` (closed-form solid angles, both
hemispheres, error path) and ``test_flip.py`` (flip round trip through
the WCS) without astropy.
"""

import numpy as np

from romanimpreprocess_tpu.io import fits_lite
from romanimpreprocess_tpu.ops import wcsutils


def _tan_sip_header(N=256, dec0=-20.0):
    h = fits_lite.Header()
    h["CRPIX1"] = (N + 1) / 2.0
    h["CRPIX2"] = (N + 1) / 2.0
    h["CD1_1"] = 3.0555555555555554e-05
    h["CD1_2"] = 0.0
    h["CD2_1"] = 0.0
    h["CD2_2"] = 3.0555555555555554e-05
    h["CTYPE1"] = "RA---TAN-SIP"
    h["CTYPE2"] = "DEC--TAN-SIP"
    h["CRVAL1"] = 37.0
    h["CRVAL2"] = dec0
    h["LONPOLE"] = 215.0
    h["A_ORDER"] = 2
    h["A_0_2"] = 2.0e-6
    h["A_1_1"] = -1.0e-6
    h["A_2_0"] = 3.0e-6
    h["B_ORDER"] = 2
    h["B_0_2"] = 1.4e-5
    h["B_1_1"] = -1.0e-5
    h["B_2_0"] = 3.0e-7
    return h


def test_pix2world_world2pix_roundtrip():
    w = wcsutils.SIPWCS.from_header(_tan_sip_header())
    x = np.array([10.0, 100.0, 200.0, 55.5])
    y = np.array([20.0, 180.0, 30.0, 222.2])
    ra, dec = w.pix2world(x, y)
    x2, y2 = w.world2pix(ra, dec)
    assert np.abs(x2 - x).max() < 1e-5
    assert np.abs(y2 - y).max() < 1e-5


def test_crval_at_crpix():
    w = wcsutils.SIPWCS.from_header(_tan_sip_header())
    # SIP terms are zero at (u,v)=(0,0), so CRPIX maps to CRVAL
    ra, dec = w.pix2world(w.crpix[0], w.crpix[1])
    assert abs(float(ra) - 37.0) < 1e-9
    assert abs(float(dec) - (-20.0)) < 1e-9


def test_pixelarea_tan_closed_form():
    """TAN: dOmega = |det CD| (rad^2) cos^3(c), c = distance from axis."""
    for dec0 in (-20.0, 20.0):  # both hemispheres (pole-choice branch)
        N = 64
        s = 0.11 / 3600.0  # deg/pixel
        h = _tan_sip_header(N=N, dec0=dec0)
        h["CD1_1"] = h["CD2_2"] = s
        for key in list(h.keys()):
            if key.startswith(("A_", "B_")):
                del h[key]
        w = wcsutils.SIPWCS.from_header(h)
        area = wcsutils.pixelarea(w, N=N)
        xx, yy = np.meshgrid(np.arange(N), np.arange(N))
        u = (xx - w.crpix[0]) * s
        v = (yy - w.crpix[1]) * s
        c = np.arctan(np.hypot(u, v) * wcsutils.DEG)
        expect = (s * wcsutils.DEG) ** 2 * np.cos(c) ** 3
        rel = np.abs(area / expect - 1)
        assert rel.max() < 2e-4, rel.max()


def test_pixelarea_stg_closed_form():
    """STG: dOmega = |det CD| (rad^2) cos^4(c/2)."""
    N = 64
    s = 1.0 / 3600.0
    h = _tan_sip_header(N=N)
    h["CD1_1"] = h["CD2_2"] = s
    h["CTYPE1"] = "RA---STG"
    h["CTYPE2"] = "DEC--STG"
    for key in list(h.keys()):
        if key.startswith(("A_", "B_")):
            del h[key]
    w = wcsutils.SIPWCS.from_header(h)
    area = wcsutils.pixelarea(w, N=N)
    xx, yy = np.meshgrid(np.arange(N), np.arange(N))
    u = (xx - w.crpix[0]) * s
    v = (yy - w.crpix[1]) * s
    R = np.hypot(u, v)
    c = 2 * np.arctan(R * wcsutils.DEG / 2.0)
    expect = (s * wcsutils.DEG) ** 2 * np.cos(c / 2.0) ** 4
    assert np.abs(area / expect - 1).max() < 2e-4


def test_sip_hflip_roundtrip():
    """Points mapped through the original WCS land at mirrored pixels in
    the flipped WCS (reference test_flip gate: < 1e-4 px)."""
    N = 256
    h = _tan_sip_header(N=N)
    data = np.arange(N * N, dtype=np.float32).reshape(N, N)
    orig = data.copy()
    h2 = h.copy()
    wcsutils.sip_hflip(data, h2)
    assert np.array_equal(data[:, ::-1], orig)

    w1 = wcsutils.SIPWCS.from_header(h)
    w2 = wcsutils.SIPWCS.from_header(h2)
    pts = np.array([[100.0, 25.0], [200.0, 80.0], [13.0, 250.0]])
    ra, dec = w1.pix2world(pts[:, 0], pts[:, 1])
    x2, y2 = w2.world2pix(ra, dec)
    assert np.abs(((N - 1.0) - pts[:, 0]) - x2).max() < 1e-4
    assert np.abs(pts[:, 1] - y2).max() < 1e-4


def test_sip_vflip_roundtrip():
    N = 256
    h = _tan_sip_header(N=N)
    data = np.arange(N * N, dtype=np.float32).reshape(N, N)
    orig = data.copy()
    h2 = h.copy()
    wcsutils.sip_vflip(data, h2)
    assert np.array_equal(data[::-1, :], orig)
    w1 = wcsutils.SIPWCS.from_header(h)
    w2 = wcsutils.SIPWCS.from_header(h2)
    pts = np.array([[100.0, 25.0], [200.0, 80.0]])
    ra, dec = w1.pix2world(pts[:, 0], pts[:, 1])
    x2, y2 = w2.world2pix(ra, dec)
    assert np.abs(pts[:, 0] - x2).max() < 1e-4
    assert np.abs(((N - 1.0) - pts[:, 1]) - y2).max() < 1e-4


def test_roundtrip_precision_near_crpix():
    """pix->world->pix must hold to well under 1e-6 px EVERYWHERE,
    including at/near the reference pixel: the arcsin form of the
    spherical rotation lost sqrt(eps) (~4e-4 px) exactly at CRPIX,
    where the native frame's pole sits.  Guards the stable arctan2
    form (the embedded-WCS reconstruction contract is 1e-6 px)."""
    for ctype in ("TAN", "STG"):
        h = {"CRPIX1": 2044.0, "CRPIX2": 2044.0, "CRVAL1": 80.1,
             "CRVAL2": -69.2, "CD1_1": -2.8e-5, "CD1_2": 1.3e-6,
             "CD2_1": 1.2e-6, "CD2_2": 2.9e-5,
             "CTYPE1": f"RA---{ctype}-SIP", "A_ORDER": 2, "B_ORDER": 2,
             "A_2_0": 2e-7, "A_0_2": -1.5e-7, "A_1_1": 8e-8,
             "B_2_0": -9e-8, "B_0_2": 2.2e-7, "B_1_1": -6e-8}
        w = wcsutils.SIPWCS.from_header(h, zero_based=True)
        g = np.linspace(0, 4087, 17)
        X, Y = np.meshgrid(g, g)
        x = np.concatenate([X.ravel(), [2044.0, 2043.5, 2044.25]])
        y = np.concatenate([Y.ravel(), [2044.0, 2044.5, 2043.75]])
        ra, dec = w.pix2world(x, y)
        x1, y1 = w.world2pix(ra, dec)
        err = np.max(np.hypot(x1 - x, y1 - y))
        assert err < 1e-7, (ctype, err)
