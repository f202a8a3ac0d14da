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


def _ideal_slope(config1, nside, act):
    """Ideal slope (DN/s) in the science frame, from the truth FITS."""
    hdus = fits_lite.open_fits(config1["IN"])
    truth = hdus[0].data / float(hdus[0].header["EXPTIME"]) / pars.g_ideal
    scanum = int(config1["IN"].split("_")[-1].split(".")[0])
    truth = truth[:, ::-1] if scanum % 3 == 0 else truth[::-1, :]
    slope_ideal = np.zeros((nside, nside), np.float32)
    slope_ideal[act, act] = truth
    return slope_ideal


def _stats_stack(slope_ideal, diffs, images, errs, count, s1, s2, nside,
                 act):
    """Assemble the 8-slice statistics cube from the per-realization
    stacks and running masked moments (shared by the serial and the
    mesh-batched drivers)."""
    mean = s1 / np.maximum(count, 1e-25)
    std = np.sqrt(np.clip(s2 / np.maximum(count, 1e-25) - mean**2, 0, None))
    mean = np.where(count > 0.1, mean, -1000.0)
    std = np.where(count > 0.1, std, -1000.0)

    def embed(a):
        out = np.zeros((nside, nside), np.float32)
        out[act, act] = a
        return out

    return np.stack(
        [
            slope_ideal,
            # full-frame (the reference's diffs memmap keeps the
            # 4-pixel reference border; zeroing it would blind the
            # border ramp diagnostic this slice exists for)
            np.median(diffs, axis=0),
            embed(np.median(images, axis=0)),
            embed(count),
            embed(mean),
            embed(std),
            embed(mean - slope_ideal[act, act]),
            embed(np.median(errs, axis=0)),
        ]
    )


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

    slope_ideal = _ideal_slope(config1, nside, act)

    diffs = np.zeros((nrun, nside, nside), np.float32)
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
        diffs[j] = l1d[-1] - l1d[1]
        images[j] = np.asarray(r["data"])
        errs[j] = np.asarray(r["err"])
        w = ~np.asarray(mask_j(jnp.asarray(r["dq"])))
        count += w
        s1 += np.where(w, images[j], 0.0)
        s2 += np.where(w, images[j] ** 2, 0.0)

    stack = _stats_stack(slope_ideal, diffs, images, errs, count, s1, s2,
                         nside, act)
    if outfile:
        fits_lite.PrimaryHDU(stack).writeto(outfile, overwrite=True)
    return stack


def run_many_mesh(config1, config2, nrun, outfile=None, mesh=None,
                  seed=None):
    """Mesh-batched Monte-Carlo: ``nrun`` realizations as vmapped lanes
    sharded over a ``("sca",)`` device mesh — here the batch axis is
    REALIZATIONS, not SCAs (the reference's serial
    ``validation_tests/many_realizations.py`` loop becomes
    ceil(nrun/ndev) sharded dispatches of the in-memory staged
    sim->L1->L2 pipeline; no per-realization files).

    One file-mediated realization runs first (it writes the L1 + WCS
    sidecar that establish the prep/area-factor and the truth rate);
    statistics then come from the batched device runs only, so the
    result measures the same chain as :func:`run_many` but is NOT
    realization-for-realization identical to it (different RNG
    streams: one exposure key per batch, per-lane streams derived
    internally — the batched rbg generator ignores lane key values
    beyond lane 0, see ``noise_core._staged_layer_machinery``).

    Returns the same (8, nside, nside) stack as :func:`run_many`.
    """
    import jax
    import jax.numpy as jnp

    from .. import parallel
    from ..ops import rand
    from ..pipeline import noise_core, sim_to_l1 as s2l

    config1 = dict(config1)
    config1.setdefault("SEED", 100)
    if config1["OUT"] != config2["IN"]:
        raise ValueError("broken pipe: config1[OUT] != config2[IN]")
    if "EXTRACT_REF" in config1:
        # run_config simulates the FULL read pattern and then subtracts
        # the offset-shifted reference read from every group
        # (sim_to_l1.py:697-719); the staged core here synthesizes the
        # post-extraction pattern directly and would silently measure a
        # chain without that correlated noise
        raise ValueError(
            "run_many_mesh does not model EXTRACT_REF reference-read "
            "subtraction; use run_many for EXTRACT_REF configs"
        )
    if str(config1.get("CALDIR")) != str(config2.get("CALDIR")):
        # the staged exposure core builds BOTH the sim-side arrays and
        # the calibration bundle from config2's pack — a mismatched-cal
        # validation (sim with set A, calibrate with set B, e.g. to
        # quantify dark/linearity-error bias) would silently lose the
        # mismatch physics and report a bias-free chain
        raise ValueError(
            "run_many_mesh requires config1[CALDIR] == config2[CALDIR] "
            "(the staged core sims and calibrates from one pack); use "
            "run_many for mismatched-calibration validations"
        )

    x = s2l.run_config(config1)  # L1 + sidecar + truth rate
    pack = calfiles.load_caldir_cached(config2["CALDIR"])
    nside = pack.nside
    nb = pars.nborder
    na = nside - 2 * nb
    act = slice(nb, nside - nb)
    slope_ideal = _ideal_slope(config1, nside, act)

    area_factor = l1_to_l2.area_factor_from_config(config2, nside)
    l1 = asdf_lite.open(config2["IN"])["roman"]
    prep = l1_to_l2.prepare_inputs(l1, config2, pack, area_factor)

    mesh = mesh if mesh is not None else parallel.sca_mesh()
    ndev = int(mesh.devices.size)
    m = noise_core._staged_layer_machinery(prep, pack, config2, mesh=mesh)
    cfg = m.cfg
    simcore = m.wrap_cached(s2l._l1_core_factory(
        m.read_pattern, m.frame_time, cfg["has_biascorr"],
        cfg["has_ipc"], True,
        ipc_pallas=cfg.get("ipc_pallas", False),
        contract=cfg.get("contract", "dot"),
    ))
    fillcore = m.wrap_cached(s2l._fill_core_factory(
        tuple(len(g) for g in m.read_pattern), nside, m.geom[2], nb,
        True, bool(m.do_amp33), im_is_active=True,
        pink_pallas=m.cfg.get("pink_pallas", False),
    ))
    core_v = m.wrap_cached(l1_to_l2._get_core(
        prep["plan"],
        dict(cfg, outputs=("slope", "slope_err_read",
                           "slope_err_poisson", "pdq")),
        prep["geom"],
    ))

    def _post(out, u16):
        # the per-realization quantities run_many reads from the L2
        # tree: sky-subtracted slope, hypot error, PixelMask1 mask on
        # the active dq, last-minus-second L1 group difference
        sl = out["slope"][nb:-nb, nb:-nb]
        err = jnp.hypot(
            out["slope_err_read"], out["slope_err_poisson"]
        )[nb:-nb, nb:-nb]
        masked = PixelMask1.build(out["pdq"][nb:-nb, nb:-nb])
        ld = u16[-1].astype(jnp.float32) - u16[1].astype(jnp.float32)
        return ld, sl, err, masked

    post_v = m.wrap(_post)

    def run(key, arrs):
        key = m.lane_keys(key, n=ndev)
        ks = m.split_keys(key)
        res, _l1dq = simcore(ks[0], arrs["rate"], arrs)
        im_u16, amp33_u16 = fillcore(
            ks[1], dict(noise_core.fill_call_arrs(arrs), im=res)
        )
        arrs0 = dict(arrs, data=im_u16)
        if m.do_amp33:
            arrs0["amp33"] = m.to_f32(amp33_u16)
        return post_v(core_v(arrs0), im_u16)

    rate = np.asarray(x.truth_rate, np.float32)
    if config1.get("PERSISTENCE"):
        # truth_rate excludes the persistence charge rate (run_config
        # threads it into make_l1_fullcal separately) — add it here so
        # the batched realizations simulate the same chain as run_many
        rate = rate + np.asarray(
            fits_lite.open_fits(config1["PERSISTENCE"])[0].data, np.float32
        )
    arr = noise_core.exposure_arrays(prep, pack, rate)
    # all lanes share one SCA's arrays: replicate with stride-0 views
    # (broadcast_batch would materialize ndev host copies of the
    # multi-GB cal bundle; each device still holds just its lane)
    batch = parallel.shard_batch(
        mesh,
        {
            k: np.broadcast_to(np.asarray(v)[None],
                               (ndev,) + np.asarray(v).shape)
            for k, v in arr.items()
        },
    )

    diffs = np.zeros((nrun, nside, nside), np.float32)
    images = np.zeros((nrun, na, na), np.float32)
    errs = np.zeros((nrun, na, na), np.float32)
    count = np.zeros((na, na), np.float32)
    s1 = np.zeros((na, na), np.float32)
    s2 = np.zeros((na, na), np.float32)

    seed0 = int(config1["SEED"] if seed is None else seed)
    for b in range((nrun + ndev - 1) // ndev):
        ld, img, err, masked = run(rand.sim_key(seed0 + b), batch)
        take = min(ndev, nrun - b * ndev)
        sl = slice(b * ndev, b * ndev + take)
        diffs[sl] = np.asarray(ld)[:take]
        images[sl] = np.asarray(img)[:take]
        errs[sl] = np.asarray(err)[:take]
        w = ~np.asarray(masked)[:take]
        count += w.sum(axis=0)
        s1 += np.where(w, images[sl], 0.0).sum(axis=0)
        s2 += np.where(w, images[sl] ** 2, 0.0).sum(axis=0)

    stack = _stats_stack(slope_ideal, diffs, images, errs, count, s1, s2,
                         nside, act)
    if outfile:
        fits_lite.PrimaryHDU(stack).writeto(outfile, overwrite=True)
    return stack


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    use_mesh = "--mesh" in argv
    argv = [a for a in argv if a != "--mesh"]
    if len(argv) < 3:
        print(
            "Calling format: python -m "
            "romanimpreprocess_tpu.validation.many_realizations "
            "config1.yaml config2.yaml N [outfile.fits] [--mesh]"
        )
        return
    config1 = load_config(argv[0])
    config2 = load_config(argv[1])
    nrun = int(argv[2])
    outfile = argv[3] if len(argv) > 3 else config2["OUT"][:-5] + "_many_out.fits"
    if use_mesh:
        run_many_mesh(config1, config2, nrun, outfile)
    else:
        run_many(config1, config2, nrun, outfile)


if __name__ == "__main__":
    main()
