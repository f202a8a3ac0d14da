"""Monte-Carlo validation: many sim->L1->L2 realizations of one scene.

Equivalent of the reference's ``validation_tests/many_realizations.py``:
re-runs the full chain N times with spaced seeds and reports an 8-slice
statistics cube (ideal slope, median L1 group difference, median L2,
unmasked count/mean/std, bias vs truth, median reported error).

Structural difference: the reference re-enters the file pipelines and
accumulates in host memmaps; here each realization stays in memory
(``calibrate_tree``), and the masked moment accumulation is a running
device reduction — no memmap staging.

Usage::

    python -m romanimpreprocess_tpu.validation.many_realizations \
        config1.yaml config2.yaml N [outfile.fits]
"""

import sys

import numpy as np

from .. import pars
from ..config import load_config
from ..io import asdf_lite, calfiles, fits_lite
from ..ops.mask import PixelMask1
from ..pipeline import l1_to_l2, sim_to_l1


def run_many(config1, config2, nrun, outfile=None, seed_step=10):
    """Run ``nrun`` realizations; returns the (8, nside, nside) stack."""
    import jax
    import jax.numpy as jnp

    mask_j = jax.jit(PixelMask1.build)

    config1 = dict(config1)
    config1.setdefault("SEED", 100)
    if config1["OUT"] != config2["IN"]:
        raise ValueError("broken pipe: config1[OUT] != config2[IN]")

    pack = calfiles.load_caldir(config2["CALDIR"])
    nside = pack.nside
    nb = pars.nborder
    na = nside - 2 * nb
    act = slice(nb, nside - nb)
    area_factor = None  # computed after the first sim writes the sidecar

    # ideal slope (DN/s) in the science frame
    hdus = fits_lite.open_fits(config1["IN"])
    truth = hdus[0].data / float(hdus[0].header["EXPTIME"]) / pars.g_ideal
    scanum = int(config1["IN"].split("_")[-1].split(".")[0])
    truth = truth[:, ::-1] if scanum % 3 == 0 else truth[::-1, :]
    slope_ideal = np.zeros((nside, nside), np.float32)
    slope_ideal[act, act] = truth

    diffs = np.zeros((nrun, na, na), np.float32)
    images = np.zeros((nrun, na, na), np.float32)
    errs = np.zeros((nrun, na, na), np.float32)
    count = np.zeros((na, na), np.float32)
    s1 = np.zeros((na, na), np.float32)
    s2 = np.zeros((na, na), np.float32)

    for j in range(nrun):
        config1 = dict(config1, SEED=config1["SEED"] + seed_step)
        x = sim_to_l1.run_config(config1)
        l1 = asdf_lite.open(config2["IN"])["roman"]
        if area_factor is None:
            area_factor = l1_to_l2.area_factor_from_config(config2, nside)
        tree, _ = l1_to_l2.calibrate_tree(l1, config2, pack, area_factor)
        r = tree["roman"]

        l1d = np.asarray(l1["data"], np.float32)
        diffs[j] = (l1d[-1] - l1d[1])[act, act]
        images[j] = np.asarray(r["data"])
        errs[j] = np.asarray(r["err"])
        w = ~np.asarray(mask_j(jnp.asarray(r["dq"])))
        count += w
        s1 += np.where(w, images[j], 0.0)
        s2 += np.where(w, images[j] ** 2, 0.0)

    mean = s1 / np.maximum(count, 1e-25)
    std = np.sqrt(np.clip(s2 / np.maximum(count, 1e-25) - mean**2, 0, None))
    mean = np.where(count > 0.1, mean, -1000.0)
    std = np.where(count > 0.1, std, -1000.0)

    def embed(a):
        out = np.zeros((nside, nside), np.float32)
        out[act, act] = a
        return out

    stack = np.stack(
        [
            slope_ideal,
            embed(np.median(diffs, axis=0)),
            embed(np.median(images, axis=0)),
            embed(count),
            embed(mean),
            embed(std),
            embed(mean - slope_ideal[act, act]),
            embed(np.median(errs, axis=0)),
        ]
    )
    if outfile:
        fits_lite.PrimaryHDU(stack).writeto(outfile, overwrite=True)
    return stack


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 3:
        print(
            "Calling format: python -m "
            "romanimpreprocess_tpu.validation.many_realizations "
            "config1.yaml config2.yaml N [outfile.fits]"
        )
        return
    config1 = load_config(argv[0])
    config2 = load_config(argv[1])
    nrun = int(argv[2])
    outfile = argv[3] if len(argv) > 3 else config2["OUT"][:-5] + "_many_out.fits"
    run_many(config1, config2, nrun, outfile)


if __name__ == "__main__":
    main()
