"""Round-trip tests for the ASDF/FITS I/O layer."""

import numpy as np
import pytest

from romanimpreprocess_tpu.io import asdf_lite, fits_lite


def test_asdf_roundtrip(tmp_path):
    tree = {
        "roman": {
            "data": np.arange(12, dtype=np.float32).reshape(3, 4),
            "dq": np.array([[1, 2], [3, 2**31]], dtype=np.uint32),
            "t0": 3.25,
            "name": "x",
            "anc": {"U_PINK": 0.4},
            "lst": [1, 2, 3],
            "flag": True,
            "none": None,
            "f16": np.ones((2, 2), np.float16),
            "u16": np.array([0, 65535], np.uint16),
        }
    }
    p = str(tmp_path / "t.asdf")
    asdf_lite.AsdfFile(tree).write_to(p)
    r = asdf_lite.open(p)["roman"]
    assert np.array_equal(r["data"], tree["roman"]["data"])
    assert r["data"].dtype == np.float32
    assert np.array_equal(r["dq"], tree["roman"]["dq"])
    assert r["dq"].dtype == np.uint32
    assert r["t0"] == 3.25 and r["name"] == "x"
    assert r["anc"]["U_PINK"] == 0.4
    assert r["lst"] == [1, 2, 3] and r["flag"] is True and r["none"] is None
    assert r["f16"].dtype == np.float16
    assert np.array_equal(r["u16"], [0, 65535])


def test_asdf_truncated_raises(tmp_path):
    p = str(tmp_path / "t.asdf")
    asdf_lite.AsdfFile(
        {"a": np.zeros((64, 64), np.float32), "b": {"c": 1}}
    ).write_to(p)
    raw = open(p, "rb").read()
    with open(str(tmp_path / "bad.asdf"), "wb") as f:
        f.write(raw[: len(raw) // 3])
    with pytest.raises(Exception):
        t = asdf_lite.open(str(tmp_path / "bad.asdf"))
        _ = t["a"]


def test_fits_roundtrip(tmp_path):
    h = fits_lite.Header()
    h["EXPTIME"] = 139.8
    h["FILTER"] = "F184"
    h["CRPIX1"] = 2044.5
    h["CD1_1"] = -3.0555555555555554e-05
    h["CTYPE1"] = "RA---TAN-SIP"
    h["EXTEND"] = True
    h["COMMENT"] = "truth wcs"
    s = h.tostring()
    assert len(s) % 2880 == 0
    h2 = fits_lite.Header.fromstring(s)
    assert h2["EXPTIME"] == 139.8
    assert h2["CD1_1"] == -3.0555555555555554e-05
    assert h2["CTYPE1"] == "RA---TAN-SIP"
    assert h2["EXTEND"] is True

    img = np.random.RandomState(0).normal(size=(32, 16)).astype(np.float32)
    cube = np.random.RandomState(1).randint(0, 65535, (3, 8, 8)).astype(np.uint16)
    p = str(tmp_path / "t.fits")
    fits_lite.HDUList(
        [fits_lite.PrimaryHDU(img, header=h), fits_lite.ImageHDU(cube, name="CUBE")]
    ).writeto(p)
    hl = fits_lite.open_fits(p)
    assert np.allclose(hl[0].data, img)
    assert hl[0].header["EXPTIME"] == 139.8
    assert np.array_equal(hl[1].data, cube)
    assert hl[1].data.dtype == np.uint16


def test_fits_header_file_roundtrip(tmp_path):
    """WCS sidecar path: header -> text file -> header."""
    h = fits_lite.Header()
    h["CRVAL1"] = 37.0
    h["A_0_2"] = 2.0e-6
    p = str(tmp_path / "wcs.txt")
    h.tofile(p)
    h2 = fits_lite.Header.fromstring(open(p).read())
    assert h2["CRVAL1"] == 37.0 and h2["A_0_2"] == 2e-6


def test_header_copy_isolates_comments():
    """Header.copy must deep-copy COMMENT/HISTORY lists: appending a
    comment to the copy must not mutate the original (sim_to_l1 copies
    the truth header and adds a COMMENT before writing the sidecar)."""
    from romanimpreprocess_tpu.io.fits_lite import Header

    h = Header()
    h["NAXIS"] = 2
    h["COMMENT"] = "original comment"
    h2 = h.copy()
    h2["COMMENT"] = "sidecar note"
    assert h._values["COMMENT"] == ["original comment"]
    assert h2._values["COMMENT"] == ["original comment", "sidecar note"]
    assert h2["NAXIS"] == 2
