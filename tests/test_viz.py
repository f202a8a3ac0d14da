"""Visualization tool tests: filmstrip PDF, diff FITS, FPA mosaic."""

import os

import numpy as np
import pytest

from romanimpreprocess_tpu.io import asdf_lite, fits_lite
from romanimpreprocess_tpu.ops.mask import PixelMask1
from romanimpreprocess_tpu.synth import make_cal_files
from romanimpreprocess_tpu.utils import diff as diffmod
from romanimpreprocess_tpu.utils import fpaplot, visualize

READ_PATTERN = [[0], [1, 2], [3, 4, 5]]
N = 128


@pytest.fixture(scope="module")
def l1file(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("viz"))
    rng = np.random.RandomState(0)
    data = (
        12000 + 40 * np.arange(3)[:, None, None]
        + rng.normal(0, 5, (3, N, N))
    ).astype(np.float32)
    data = np.clip(np.round(data), 0, 65535).astype(np.uint16)
    asdf_lite.AsdfFile(
        {"roman": {"data": data,
                   "meta": {"exposure": {"read_pattern": READ_PATTERN}}}}
    ).write_to(d + "/L1.asdf")
    return d


def test_visualize_pdf(l1file):
    d = l1file
    visualize.visualize(
        [None, d + "/L1.asdf", "8,40,16,48", d + "/strip.pdf", 0.5]
    )
    assert os.path.getsize(d + "/strip.pdf") > 1000


def test_diff_cli(l1file):
    d = l1file
    diffmod.main(["prog", d + "/L1.asdf", d + "/d.fits", "0", "2"])
    out = fits_lite.open_fits(d + "/d.fits")[0].data
    assert out.shape == (N, N)
    assert 60 < np.median(out) < 100  # 2 groups x 40 DN apart


def test_fpaplot_mosaic(tmp_path):
    d = str(tmp_path)
    for sca in (1, 4):
        make_cal_files(f"{d}/roman_wfi", READ_PATTERN, nside=N, seed=sca,
                       tag="V", sca=sca)
    fmt = d + "/roman_wfi_{:s}_V_SCA{:02d}.asdf"

    img = fpaplot.read_sca_image(fmt, 64, "gain", 4, mask=PixelMask1)
    assert img.shape == (64, 64)
    # synthetic cal geometry is 128^2, padded to 4096 -> the data sits in
    # the central bin; the rest is zero-padding
    assert np.nanmax(img) > 0

    arr = fpaplot.make_big_image(
        fmt, 64, "gain", vmin=1.2, vmax=2.1, mask=PixelMask1,
        scaleformat="{:4.2f}",
    )
    assert arr.dtype == np.uint8 and arr.shape[-1] == 3
    # missing SCAs plot as background; present ones leave colored pixels
    assert (arr != 255).any()

    sheet = fpaplot.multi_image(fmt, 32, PixelMask1)
    assert sheet.dtype == np.uint8
    assert sheet.shape[0] > arr.shape[0]  # 4 rows of panels


def test_write_text():
    img = np.zeros((40, 80), np.uint8)
    fpaplot.write_text(img, (2, 2), 1, 255, "A1")
    assert (img == 255).sum() > 5
