"""MAST/TVAC uncal conversion tests."""

import numpy as np

from romanimpreprocess_tpu.calib import mast
from romanimpreprocess_tpu.io import asdf_lite, fits_lite


def test_uncal_asdf_to_fits(tmp_path):
    rng = np.random.RandomState(0)
    nf, n = 4, 64
    data = rng.randint(0, 60000, (nf, n, n)).astype(np.uint16)
    a33 = rng.randint(0, 60000, (nf, n, 8)).astype(np.uint16)
    asdf_lite.AsdfFile({"roman": {"data": data, "amp33": a33}}).write_to(
        str(tmp_path / "r0_WFI04_uncal.asdf")
    )
    out = mast.uncal_asdf_to_fits(
        str(tmp_path / "r0_WFI04_uncal.asdf"), str(tmp_path / "c.fits")
    )
    hdus = fits_lite.open_fits(out)
    assert hdus[0].header["TGROUP"] == mast.TVAC_FRAME_TIME
    cube = hdus[1].data
    assert cube.shape == (1, nf, n, n + 128)
    assert np.array_equal(cube[0, :, :, :n], data)
    assert np.array_equal(cube[0, :, :, n : n + 8], a33)


def test_map_downloads(tmp_path):
    rng = np.random.RandomState(1)
    names = []
    for k in (2, 1):
        nm = f"r{k}_WFI07_uncal.asdf"
        asdf_lite.AsdfFile(
            {"roman": {"data": rng.randint(0, 100, (2, 16, 16)).astype(np.uint16)}}
        ).write_to(str(tmp_path / nm))
        names.append(nm)
    # a non-matching SCA file
    asdf_lite.AsdfFile(
        {"roman": {"data": np.zeros((2, 16, 16), np.uint16)}}
    ).write_to(str(tmp_path / "r0_WFI08_uncal.asdf"))
    manifest = tmp_path / "download_wfi07.txt"
    manifest.write_text(
        "x y r2_WFI07_uncal.asdf\nx y r1_WFI07_uncal.asdf\n"
        "x y r0_WFI08_uncal.asdf\n"
    )
    out = mast.map_downloads(
        str(manifest), 7, str(tmp_path), str(tmp_path)
    )
    assert len(out) == 2
    assert out[0].endswith("99999999_SCA07_Noise_001.fits")
