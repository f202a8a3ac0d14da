"""Raw test-data conversion: per-frame FITS -> ramp-cube FITS.

Equivalent of the reference's ``convert_dark.py`` / ``convert_flt.py`` /
``convert_loflt.py`` (``runs/summer2025run``): collects the N per-frame
full-frame images of one exposure into a (1, N, 4096, 4224) uint16 cube
(science area + amp33), flips from the Detector frame to the Science
frame by SCA row, and appends unweighted slope images (full ramp and
first half, first frame dropped) in DN/frame.
"""

import datetime

import numpy as np

from ..io import fits_lite


def detector_to_science(cube, sca):
    """Flip a (..., ny, nx_aug) cube from Detector to Science frame.

    SCAs in the 3n row flip horizontally (science columns only; the
    amp33 block is not mirrored), others flip vertically.
    """
    n = cube.shape[-2]  # science area is n x n; trailing columns = amp33
    out = cube.copy()
    if sca % 3 == 0:
        out[..., :, :n] = out[..., :, n - 1 :: -1]
    else:
        out = out[..., ::-1, :]
    return out


def unweighted_slopes(cube):
    """(2, ny, nx) slope images in DN/frame: full ramp and first half,
    both excluding frame 0 (centered unweighted least squares)."""
    nframes = cube.shape[0]
    ny, nx = cube.shape[-2:]
    slp = np.zeros((2, ny, nx), dtype=np.float64)
    for count, kmax in ((0, nframes), (1, nframes // 2)):
        den = 0.0
        ctr = kmax / 2.0
        for k in range(1, kmax):
            slp[count] += cube[k].astype(np.float64) * (k - ctr)
            den += (k - ctr) ** 2
        if den > 0:  # degenerate for very short ramps (kmax <= 2)
            slp[count] /= den
    return slp.astype(np.float32)


def group_exposures(files, nframes=None, exp_re=r"exp(\d+)_"):
    """Group per-frame FITS paths into exposures, in time order.

    The raw test-campaign convention (reference ``convert_dark.py:23-48``)
    names frames ``..._exp{j}_...SCU{sca}...{frame-id}.fits``; the frame
    id of a science frame ends in a hex character, while guide-window
    interleaves do not and are dropped.  Returns a list of
    (exposure_number, [files...]) sorted by exposure number, keeping
    only groups with at least ``nframes`` frames (and truncating each
    group to the first ``nframes`` when given, as the reference's
    converters do with their N argument).
    """
    import re

    groups = {}
    for f in sorted(files):
        name = f.split("/")[-1]
        if not re.search(r"[0-9A-Fa-f]\.fits$", name):
            continue  # guide-window file
        m = re.search(exp_re, name)
        if m is None:
            continue
        groups.setdefault(int(m.group(1)), []).append(f)
    out = []
    for j in sorted(groups):
        g = groups[j]
        if nframes is not None:
            if len(g) < nframes:
                continue
            g = g[:nframes]
        out.append((j, g))
    return out


def convert_exposure(frame_files, out_path, sca, frame_time=3.04, flip=True):
    """Merge one exposure's per-frame FITS files into the ramp-cube FITS.

    ``frame_files`` are paths to single-frame (4096, 4224) images in
    time order.  Output: primary (TGROUP) + cube HDU (1, N, 4096, 4224)
    + slope HDU, matching the solid-waffle FORMAT 6 layout the
    reference's converters produce.
    """
    n = len(frame_files)
    cube = None
    dates = []
    for k, path in enumerate(frame_files):
        hdus = fits_lite.open_fits(path)
        if cube is None:
            cube = np.zeros((n,) + hdus[0].data.shape, dtype=np.uint16)
        cube[k] = hdus[0].data
        dates.append(str(hdus[0].header.get("DATE", "")))

    if flip:
        cube = detector_to_science(cube, sca)
    slp = unweighted_slopes(cube)

    hdr = fits_lite.Header()
    hdr["PROVEN"] = "romanimpreprocess_tpu.calib.convert"
    hdr["NMAX"] = n
    hdr["DATE"] = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    for k, (path, date) in enumerate(zip(frame_files, dates)):
        hdr[f"FR{k + 1:03d}"] = path.split("/")[-1][:60]
        if date:
            hdr[f"FRD{k + 1:03d}"] = date[:60]
    hdr2 = fits_lite.Header()
    hdr2["BUNIT"] = "DN/frame"
    prim = fits_lite.PrimaryHDU()
    prim.header["TGROUP"] = frame_time
    fits_lite.HDUList(
        [
            prim,
            fits_lite.HDU(cube[None], header=hdr),
            fits_lite.HDU(slp, header=hdr2),
        ]
    ).writeto(out_path, overwrite=True)
    return out_path
