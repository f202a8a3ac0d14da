"""L1 -> L2 calibration: the ``gen_cal_image`` equivalent.

Re-implements the full calibration chain of the reference driver
(``src/romanimpreprocess/L1_to_L2/gen_cal_image.py:480-739``) as one
jitted device core plus a thin host wrapper:

device core (single XLA program, cube never leaves HBM):
  dq init -> saturation flagging -> per-group reference-pixel
  correction (row + channel, amp33 optimal slope) -> bias correction ->
  dark-decay / WFI18-transient corrections -> Legendre linearity ->
  IPC deconvolution -> ramp fit + jump detection (masked dense
  saturation variants) -> dark-current subtraction -> flat field /
  pixel area -> sky mode + optional Legendre sky subtraction ->
  endslice map.

host wrapper: YAML config, L1 ASDF read, CALDIR load (once), WCS
sidecar -> pixel-area map, plan precomputation, L2 ASDF/FITS write,
process log.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import pars
from ..config import load_config, resolve_backend
from ..dqflags import group as gdq
from ..dqflags import pixel
from ..io import asdf_lite, calfiles, fits_lite
from ..ops import ipc, ipc_pallas, likely, linearity, linearity_pallas, mask, ramp, refsub, saturation, sky, wcsutils
from ..utils import hostcache, typefix
from ..utils.processlog import ProcessLog
from . import oututils


# --------------------------------------------------------------------------
# Device core
# --------------------------------------------------------------------------

def _refpix_correct(data, dark_cube, amp33, amp33_med, opt_slope,
                    nside, nborder, channelwidth, use_amp33):
    """Per-group reference-pixel correction (reference
    ``gen_cal_image.py:531-556``): dark-subtracted frame (+ amp33
    reference block), row subtraction with the optimal amp33 slope,
    then channel subtraction; dark re-added afterwards.

    Equivalent to chaining ``refsub.ref_subtraction_row`` /
    ``ref_subtraction_channel`` on the augmented (nside, nside+cw)
    frame, but the augmented array is never materialized (the amp33
    columns only feed the row medians and their own — discarded —
    channel correction), saving ~1 GB of copies per 6-group frame.
    Only the amp33 row branch is custom; the fit branch and the
    channel stage ARE the :mod:`..ops.refsub` helpers applied to the
    non-augmented frame.
    """
    nb = nborder
    cw = channelwidth

    def one_group(frame, dark, a33):
        work = frame - dark
        # ---- row stage (reference_subtraction.py:77-125) ----
        if use_amp33:
            blk = a33 - amp33_med
            blk = blk - jnp.median(blk)
            ref_med = jnp.median(blk, axis=1)
            work = work - (
                opt_slope * (ref_med - jnp.median(ref_med))
            )[:, None]
        else:
            work = refsub.ref_subtraction_row(
                work, nside=nside, nborder=nb
            )
        # ---- channel stage (reference_subtraction.py:16-74) ----
        work = refsub.ref_subtraction_channel(
            work, nside=nside, nborder=nb, channelwidth=cw
        )
        return work + dark

    # vmap (not lax.map): the per-group median sorts batch into one
    # large sort instead of ngrp serialized ones
    return jax.vmap(one_group)(data, dark_cube, amp33)


def _dark_decay_signal(read_pattern, frame_time, amplitude, time_constant):
    """Per-resultant additive decay signal s_j = A * mean_r exp(-t_r/tau).

    This package's self-consistent dark-decay model (the reference
    delegates to ``romancal.dark_decay.subtract_dark_decay``,
    ``gen_cal_image.py:295-325``; the sim stage injects the identical
    model so correction closes the loop).
    """
    out = []
    for grp in read_pattern:
        ts = np.array(grp, dtype=np.float64) * frame_time
        out.append(amplitude * np.mean(np.exp(-ts / time_constant)))
    return np.asarray(out, dtype=np.float32)


#: Default core output set = exactly what the L2 product consumes
#: (``package_tree``; reference ImageModel fields, gen_cal_image.py
#: :645-700).  The full group DQ ``rdq`` (a 400 MB cube at 4096^2) and
#: the applied ``flat`` map are intermediate diagnostics the product
#: never carries — materializing them as program outputs costs HBM
#: writes and blocks fusion of the jump-bit stack into the pixel-DQ
#: reduction.  Tests/tools that want them request
#: ``cfg["outputs"] = (..., "rdq", "flat")`` explicitly.
PRODUCT_OUTPUTS = (
    "slope", "slope_withsky", "slope_err_read", "slope_err_poisson",
    "pdq", "medsky", "skycoefs", "endslice",
)

WFI18_DEFAULT_TAUS = (150.0, 1300.0)


def _wfi18_row_basis(nside, taus=WFI18_DEFAULT_TAUS):
    """Two-exponential row basis for the first-read transient.

    ``taus`` are the per-detector decay constants in effective rows —
    calibrated values come from the optional ``wfi18_transient`` cal
    table (pattern: ``dark_decay``); the defaults reproduce the
    historical hardcoded WFI18 model.  Row coordinate includes the
    4-row timing gap every 256 rows (cf. the reference's synthetic
    transient, test_workflow.py:542-544; the reference applies
    romancal's per-detector anomaly correction,
    gen_cal_image.py:327-353).
    """
    rows = np.arange(nside, dtype=np.float64)
    reff = rows + (rows // 256) * 4
    basis = np.stack([np.exp(-reff / t) for t in taus], axis=1)
    return basis.astype(np.float32)  # (nside, len(taus))


def _correct_wfi18(data, basis, nside, nborder):
    """Fit & subtract the exponential row profile from the first read.

    Row medians of (read0 - read1) isolate the transient (it only
    affects the first read); weighted least squares on the fixed-tau
    ``basis`` (shape (nside, nbasis), see :func:`_wfi18_row_basis`);
    the fitted profile is removed from read 0.  Amplitudes are fitted
    per exposure; only the taus are calibration inputs.
    """
    nb = nborder
    prof = jnp.median(
        data[0, :, nb : nside - nb] - data[1, :, nb : nside - nb], axis=1
    )
    prof = prof - jnp.median(prof)
    BtB = basis.T @ basis
    coef = jnp.linalg.solve(BtB, basis.T @ prof)
    model = basis @ coef
    return data.at[0].add(-model[:, None])


def make_core(plan, cfg, geom):
    """Build the jitted calibration core for one (MA table, config).

    ``cfg`` is a dict of static choices; ``geom`` = (nside, nborder,
    channelwidth).  Returns a function over device arrays.
    """
    nside, nborder, channelwidth = geom
    nb = nborder
    # diagnostic stage ablation (tools/profile_stages.py): names in
    # cfg["ablate"] are skipped so the fused core's true marginal stage
    # costs can be measured (standalone stage timings overstate work
    # that XLA elides in the full graph)
    ab = cfg.get("ablate", ())
    has_ipc = cfg["has_ipc"] and "ipc" not in ab

    def core(arr):
        data = arr["data"].astype(jnp.float32)  # (ngrp, N, N)
        ngrp = data.shape[0]

        # ---- dq initialization (romancal do_dqinit analog) ----
        pdq = arr["mask_dq"].astype(jnp.uint32)
        rdq = jnp.zeros(data.shape, dtype=jnp.uint32)
        if cfg["exclude_first"]:
            rdq = rdq.at[0].set(rdq[0] | jnp.uint32(gdq.DO_NOT_USE))

        # ---- saturation ----
        if "saturation" not in ab:
            rdq, pdq = saturation.flag_saturation(
                data, rdq, pdq, arr["saturation"], arr["saturation_dq"],
                backup=cfg["backup"], skip_first=1, n_pix_grow_sat=1,
            )

        # ---- reference pixel correction ----
        if "refpix" not in ab:
            data = _refpix_correct(
                data, arr["dark_cube"], arr["amp33"], arr["amp33_med"],
                arr["opt_slope"], nside, nborder, channelwidth,
                cfg["use_amp33"],
            )

        # ---- bias correction ----
        if cfg["has_biascorr"]:
            data = data.at[:, nb:-nb, nb:-nb].add(-arr["biascorr"])

        # ---- dark decay ----
        if cfg["has_dark_decay"]:
            data = data - arr["dark_decay_signal"][:, None, None]

        # ---- WFI18 transient ----
        if cfg["wfi18"]:
            data = _correct_wfi18(data, arr["wfi18_basis"], nside, nborder)

        # ---- linearity ----
        if "linearity" not in ab:
            lin = linearity.LinearityData(
                arr["lin_coefs"], arr["lin_smin"], arr["lin_smax"],
                arr["lin_sref"], arr["lin_dq"],
            )
            attempt = (rdq & jnp.uint32(gdq.SATURATED)) == 0
            if cfg.get("lin_pallas", False):
                data, dq_lin = linearity_pallas.apply_linearity_cube_fused(
                    data, lin, attempt,
                    do_not_flag_first=cfg["first_is_reset"],
                )
            else:
                data, dq_lin = linearity.apply_linearity_cube(
                    data, lin,
                    do_not_flag_first=cfg["first_is_reset"],
                    attempt_corr=attempt,
                )
            pdq = pdq | dq_lin

        # ---- IPC deconvolution ----
        # The dark-slope and (clipped) flat deconvolutions needed later
        # are cal-only (exposure-independent) work: they arrive
        # precomputed per cal pack (``ipc_precal``) instead of riding
        # along in this per-exposure cube pass — two frames of every
        # dispatch saved in production, where one cal set serves a
        # whole campaign.
        dslope_ipc = None
        flat_ipc = None
        if has_ipc and cfg.get("ipc_frame", False):
            # frame-resident variant (IPC_BACKEND 'pallas-frame'): the
            # active-slice/gain/pad/unpad/merge glue around the slab
            # kernels (~4 full-cube HBM passes) collapsed into one pass
            # with border passthrough — see ipc_rev2_frame_stream
            data = ipc_pallas.ipc_rev2_frame_stream(
                data,
                arr.get("ipc_kernel_frame", arr.get("ipc_kernel")),
                arr["gain"], nborder=nb, th=32, vmem_mb=128,
            )
            dslope_ipc = arr["dark_slope_ipc"]
            flat_ipc = arr["flat_ipc"]
        elif has_ipc:
            gain_act = arr["gain"][nb:-nb, nb:-nb]
            stacked = data[:, nb:-nb, nb:-nb] * gain_act[None]
            if cfg.get("ipc_pallas", False):
                # th=32 measured fastest at full frame (10.7 vs 11.6 ms
                # at th=16 standalone on v5e); the pre-padded kernel
                # planes (kernel_planes_padded, th=32) skip the ~0.6 GB
                # per-dispatch slab build when the caller provides them.
                # ipc_stream: the single-read ring-buffer form (one HBM
                # pass over cube+kernel instead of three halo windows;
                # bit-identical — see ipc_pallas._ipc_kernel_stream)
                ipc_fn = (
                    ipc_pallas.ipc_rev2_cube_stream
                    if cfg.get("ipc_stream", False)
                    else ipc_pallas.ipc_rev2_cube_blocked
                )
                corr = ipc_fn(
                    stacked,
                    arr.get("ipc_kernel_padded", arr.get("ipc_kernel")),
                    th=32, vmem_mb=128,
                )
            else:
                corr = ipc.ipc_rev(stacked, arr["ipc_kernel"])
            data = data.at[:, nb:-nb, nb:-nb].set(
                corr / gain_act[None]
            )
            dslope_ipc = arr["dark_slope_ipc"]
            flat_ipc = arr["flat_ipc"]

        # ---- ramp fit + jump detection ----
        dumo = chisq = None
        if cfg["likelihood_fit"]:
            (slope, ser, sep, rdq, pdq, dumo, chisq) = likely.ramp_fit_likely(
                data, rdq, pdq, plan, arr["gain"], arr["read_sigma"],
                nborder=nborder,
            )
        else:
            slope, ser, sep, rdq, pdq = ramp.ramp_fit(
                data, rdq, pdq, plan, arr["gain"], arr["read_sigma"],
                nborder=nborder,
            )

        # ---- dark current subtraction (IPC-corrected dark slope) ----
        if has_ipc:
            slope = slope.at[nb:-nb, nb:-nb].add(-dslope_ipc)
        else:
            slope = slope.at[nb:-nb, nb:-nb].add(
                -arr["dark_slope"][nb:-nb, nb:-nb]
            )
        if cfg["has_dark_dq"]:
            pdq = pdq | arr["dark_dq"]

        # zero the border of the science/variance maps (reference
        # do_ramp_fit re-embedding, gen_cal_image.py:470-475)
        interior = ramp.interior_mask(nside, nside, nb)
        slope = jnp.where(interior, slope, 0.0)
        ser = jnp.where(interior, ser, 0.0)
        sep = jnp.where(interior, sep, 0.0)

        # ---- flat field (reference flatutils.get_flat + area factor) ----
        flat = jnp.ones((nside, nside), dtype=jnp.float32)
        flat = flat.at[nb:-nb, nb:-nb].set(arr["flat"][nb:-nb, nb:-nb])
        pdq = pdq | jnp.where(
            (flat < 0.1) | (flat > 10.0),
            jnp.uint32(pixel.NO_FLAT_FIELD), jnp.uint32(0),
        )
        flat = jnp.clip(flat, 0.1, 10.0)
        if has_ipc:
            g = arr["gain"][nb:-nb, nb:-nb]
            pdq = pdq.at[nb:-nb, nb:-nb].set(
                pdq[nb:-nb, nb:-nb]
                | jnp.where(g <= 0.1, jnp.uint32(pixel.NO_GAIN_VALUE),
                            jnp.uint32(0))
            )
            flat = flat.at[nb:-nb, nb:-nb].set(flat_ipc)
        flat = (flat / arr["area_factor"]).astype(jnp.float32)
        slope = slope / flat
        ser = ser / flat
        sep = sep / flat

        # ---- sky ----
        slope_withsky = slope
        if "sky" not in ab and "smooth" not in ab:
            m = mask.PixelMask1.build(pdq)
            medsky, _ = sky.smooth_mode(
                sky.binkxk(jnp.where(~m, slope, jnp.nan), 4)
            )
        else:
            medsky = jnp.float32(0.0)
        if cfg["skyorder"] >= 0 and "sky" not in ab and "medfit" not in ab:
            skycoefs, skymodel = sky.medfit(
                slope[nb:-nb, nb:-nb], order=cfg["skyorder"],
                pallas=cfg.get("med_pallas", False),
            )
            slope = slope.at[nb:-nb, nb:-nb].add(-skymodel)
        else:
            skycoefs = jnp.zeros(0, dtype=jnp.float32)

        # ---- endslice (SLICEOUT) ----
        firstsat = ramp.first_saturated_group(rdq)[nb:-nb, nb:-nb]
        endslice = jnp.where(
            firstsat < ngrp, firstsat - 1, -1
        ).astype(jnp.int8)

        out = {
            "slope": slope,
            "slope_withsky": slope_withsky,
            "slope_err_read": ser,
            "slope_err_poisson": sep,
            "pdq": pdq,
            "rdq": rdq,
            "flat": flat,
            "medsky": medsky,
            "skycoefs": skycoefs,
            "endslice": endslice,
        }
        if dumo is not None:
            # dumo is slope-like -> flat-field it (gen_cal_image.py:671)
            out["dumo"] = dumo / flat
            out["chisq"] = chisq
        # restricted-output variant: XLA dead-code-eliminates every op
        # feeding only dropped fields (e.g. a slope-only core for
        # noise-layer re-entries skips the error/variance maps and the
        # smooth-mode sky diagnostic entirely).  The DEFAULT is the
        # product contract (PRODUCT_OUTPUTS + the likelihood
        # diagnostics) — see the PRODUCT_OUTPUTS note.
        keys = cfg.get("outputs") or (
            PRODUCT_OUTPUTS + (("dumo", "chisq") if dumo is not None
                               else ())
        )
        return {k: out[k] for k in keys}

    return jax.jit(core)


# --------------------------------------------------------------------------
# Host driver
# --------------------------------------------------------------------------

# cap 25 > the 18-SCA focal plane so per-SCA cal packs stay resident
# across a production sweep (see utils.hostcache for the thread-pool
# concurrency contract)
_IPC_PRECAL_CACHE = hostcache.BoundedCache(25)


def ipc_precal(flat, dark_slope, gain, ipc_kernel, nborder):
    """IPC-deconvolved dark-slope and clipped-flat planes (numpy).

    The calibration needs the dark-slope and flat frames pushed through
    the same order-2 IPC inverse as the data cube (reference
    ``subtract_dark_current`` IPC-corrects the dark ref first,
    ``gen_cal_image.py:217-221``; ``get_flat`` deconvolves the flat,
    ``flatutils.py:61-74``).  Both are exposure-INDEPENDENT, so they
    are computed once per cal pack here (id-keyed cache) instead of
    riding along in every per-exposure IPC dispatch.

    Returns ``(dark_slope_ipc, flat_ipc)``, active-region (na, na)
    float32.  Matches the in-core gain conjugation exactly: unclipped
    gain for the dark slope, gain clipped to >= 0.1 for the flat.
    """
    nb = nborder
    ck = (id(flat), id(dark_slope), id(gain), id(ipc_kernel), nb)
    hit = _IPC_PRECAL_CACHE.get(ck)
    if hit is not None:
        return hit[0]
    gain_act = np.asarray(gain[nb:-nb, nb:-nb], np.float32)
    gain_flat = np.clip(gain_act, 0.1, None)
    flat_clipped = np.clip(
        np.asarray(flat[nb:-nb, nb:-nb], np.float32), 0.1, 10.0
    )
    dslope_act = np.asarray(dark_slope[nb:-nb, nb:-nb], np.float32)
    stacked = np.stack(
        [dslope_act * gain_act, flat_clipped * gain_flat]
    )
    corr = np.asarray(
        jax.jit(ipc.ipc_rev)(
            jnp.asarray(stacked), jnp.asarray(ipc_kernel)
        )
    )
    out = (corr[0] / gain_act, corr[1] / gain_flat)
    # strong refs to the inputs in the value so a GC'd array can't
    # alias a stale id-keyed entry
    return _IPC_PRECAL_CACHE.put(
        ck, (out, (flat, dark_slope, gain, ipc_kernel))
    )[0]


_CORE_CACHE = {}


def core_key(plan, cfg, geom):
    """Hashable identity of a compiled calibration core: the static
    config, geometry, and MA-table/plan signature.  Also used by
    ``parallel.calibrate_fpa`` to group mixed-config SCA batches.

    Every ndarray field of the plan is hashed by content — the plan's
    arrays are baked into the compiled core as constants, so two plans
    that differ anywhere (different u, frame time, jump thresholds)
    must never share a core.  (A round-1 key used ``plan.W.sum()``,
    which is identically 0 for zero-sum slope weights and silently
    collided plans built with different RAMP_OPT_PARS.)
    """
    fields = plan._asdict().items()  # plans are NamedTuples
    arrays = tuple(
        (name, np.asarray(v).tobytes())
        for name, v in fields
        if isinstance(v, (np.ndarray, jnp.ndarray))
    )
    scalars = tuple(
        (name, v)
        for name, v in fields
        if isinstance(v, (int, float, bool, str, tuple))
    )
    return (
        tuple(sorted((k, v) for k, v in cfg.items())),
        geom,
        type(plan).__name__,
        arrays,
        scalars,
    )


def cal_cfg(cfg):
    """The cfg subset the CALIBRATION core actually reads.

    Strips sim/noise-only keys (the read-axis ``contract`` backend and
    the fill's ``pink_pallas``) so configs differing only in those
    share one compiled cal program — the single definition used by
    ``_get_core``, ``parallel.make_fpa_calibrator``, and
    ``parallel.calibrate_fpa``'s grouping (three hand-rolled copies of
    this strip would be the same drift hazard class as the round-1
    W.sum() key collision).
    """
    return {k: v for k, v in cfg.items()
            if k not in ("contract", "pink_pallas")}


def _get_core(plan, cfg, geom):
    # flipping CONTRACT_BACKEND must not recompile a byte-identical cal
    # program (minutes per compile on the TPU relay)
    cfg = cal_cfg(cfg)
    key = core_key(plan, cfg, geom)
    if key not in _CORE_CACHE:
        _CORE_CACHE[key] = make_core(plan, cfg, geom)
    return _CORE_CACHE[key]


_WCS_CACHE = hostcache.BoundedCache(65)


def wcs_from_config(config):
    """FITS-header WCS from the FITSWCS sidecar (reference
    ``gen_cal_image.py:64-87``), memoized by (path, mtime) — the
    sidecar is consulted twice per exposure (area factor + wcsinfo
    packaging)."""
    if "FITSWCS" not in config:
        return None
    path = config["FITSWCS"]
    mt = os.path.getmtime(path)
    hit = _WCS_CACHE.get(path)
    if hit is not None and hit[0] == mt:
        return hit[1]
    with open(path) as f:
        hdr = fits_lite.Header.fromstring(f.read())
    return _WCS_CACHE.put(path, (mt, hdr))[1]


def calibrateimage(config, verbose=False, return_arrays=False):
    """Run the L1->L2 calibration per the config dict; write the L2 ASDF.

    Config keys follow the reference (``docs/L1_to_L2_README.rst``):
    IN, OUT, CALDIR, FITSWCS, RAMP_OPT_PARS, JUMP_DETECT_PARS, SKYORDER,
    EXCLUDE_FIRST, SATURATION_BACKUP, SLICEOUT, FITSOUT,
    correct_wfi18_transient, NOISE (used by gen_noise_image).
    """
    pack = calfiles.load_caldir_cached(config["CALDIR"])
    l1 = asdf_lite.open(config["IN"])["roman"]
    area_factor = area_factor_from_config(config, pack.nside)
    tree, out = calibrate_tree(l1, config, pack, area_factor)
    typefix.fix(tree)  # schema-compat dummy fields (reference writes them)
    asdf_lite.AsdfFile(tree).write_to(config["OUT"])

    if config.get("FITSOUT", False):
        im2 = tree["roman"]
        good = ~np.asarray(mask.PixelMask1.build(jnp.asarray(im2["dq"])))
        fits_lite.HDUList(
            [
                fits_lite.PrimaryHDU(im2["data"]),
                fits_lite.ImageHDU(im2["dq"]),
                fits_lite.ImageHDU(np.where(good, im2["data"], -1000.0)),
            ]
        ).writeto(config["OUT"][:-5] + "_asdf_to.fits", overwrite=True)

    if verbose:
        print(tree["processinfo"]["log"])
    if return_arrays:
        return out
    return None


def area_factor_from_config(config, nside):
    """FITSWCS sidecar -> pixel-area / Omega_ideal map (unit if absent)."""
    thewcs = wcs_from_config(config)
    if thewcs is None:
        return np.ones((nside, nside), dtype=np.float32)
    w = wcsutils.SIPWCS.from_header(thewcs, zero_based=True)
    return (wcsutils.pixelarea(w, N=nside) / pars.Omega_ideal).astype(np.float32)


def calibrate_tree(l1, config, pack, area_factor=None, verbose=False):
    """Calibrate an in-memory L1 tree; return (L2 tree, core outputs).

    This is the pure in-memory pipeline entry the noise engine re-enters
    (the reference re-enters through temp files,
    ``gen_noise_image.py:147-154``; here it is a function call and the
    jitted core is reused across realizations).
    """
    t0 = time.perf_counter()
    prep = prepare_inputs(l1, config, pack, area_factor)
    t1 = time.perf_counter()
    core = _get_core(prep["plan"], prep["cfg"], prep["geom"])
    out = jax.device_get(core(prep["arr"]))
    t2 = time.perf_counter()
    prep = dict(
        prep,
        log=prep["log"]
        + f"Timing: host prepare {1e3 * (t1 - t0):.1f} ms; "
        f"core dispatch+device+transfer {1e3 * (t2 - t1):.1f} ms "
        "(includes compile on first call)\n",
    )
    tree = package_tree(out, prep, l1, config)
    if verbose:
        print(tree["processinfo"]["log"])
    return tree, out


def _guide_window_rows(l1meta, config, nside, expand=1):
    """Boolean (nside,) mask of rows affected by the guide-window read.

    romancal ``do_dqinit`` flags the rows spanned by the guide window,
    expanded by ``expand_gw_flagging`` rows on each side (the reference
    passes 1, ``gen_cal_image.py:118``).  Bounds come from
    ``config["GUIDE_WINDOW"] = [ystart, ystop)`` (highest priority) or
    the L1 meta ``guide_star.gw_window_ystart / gw_window_ystop``.
    Returns None when no guide-window spec is present (then no rows are
    flagged, matching romancal's no-guide-star behavior).
    """
    bounds = config.get("GUIDE_WINDOW")
    if bounds is None:
        gs = l1meta.get("guide_star")
        if gs is None or "gw_window_ystart" not in gs:
            return None
        bounds = (gs["gw_window_ystart"], gs["gw_window_ystop"])
    y0, y1 = int(bounds[0]), int(bounds[1])
    rows = np.zeros(nside, dtype=bool)
    rows[max(y0 - expand, 0):min(y1 + expand, nside)] = True
    return rows


def prepare_inputs(l1, config, pack, area_factor=None):
    """Host-side preparation: plan, static cfg, and the device array
    bundle for one SCA.  Returns a dict (``arr`` values are numpy so
    FPA batching can stack before staging to devices)."""
    mylog = ProcessLog()
    caldir = config["CALDIR"]
    nside = pack.nside
    nborder = pars.nborder
    nb = nborder
    if area_factor is None:
        area_factor = np.ones((nside, nside), dtype=np.float32)

    l1meta = l1["meta"]
    data = np.asarray(l1["data"])
    ngrp = data.shape[0]
    read_pattern = [list(g) for g in l1meta["exposure"]["read_pattern"]]
    frame_time = float(l1meta["exposure"].get("frame_time", pars.read_time))
    detector = str(l1meta.get("instrument", {}).get("detector", "WFI00"))
    channelwidth = (
        np.asarray(l1["amp33"]).shape[-1] if "amp33" in l1
        else max(nside // 32, 4)
    )
    mylog.append("Initialized data\n")

    meta = ramp.ma_table_meta(read_pattern, frame_time)
    meta["nborder"] = nborder

    exclude_first = bool(config.get("EXCLUDE_FIRST", True))
    backup = int(config.get("SATURATION_BACKUP", 1))

    # ---- guide-window DQ flagging (host side; per-exposure metadata) ----
    # romancal's do_dqinit is invoked with expand_gw_flagging=1 by the
    # reference (gen_cal_image.py:118): every science row spanned by the
    # guide-window readout, expanded by one row on each side, is flagged
    # GW_AFFECTED_DATA in the pixel DQ.
    mask_dq = (
        pack.mask_dq if pack.mask_dq is not None
        else np.zeros((nside, nside), np.uint32)
    )
    gw_rows = _guide_window_rows(l1meta, config, nside)
    if gw_rows is not None:
        mask_dq = mask_dq.copy()
        mask_dq[gw_rows] |= np.uint32(pixel.GW_AFFECTED_DATA)
        mylog.append(
            f"Guide window: flagged {int(gw_rows.sum())} rows "
            "GW_AFFECTED_DATA\n"
        )

    uopt = config.get(
        "RAMP_OPT_PARS", {"slope": 0.4, "gain": 1.8, "sigma_read": 6.5}
    )
    u_ = float(uopt["slope"]) / float(uopt["gain"]) / float(uopt["sigma_read"]) ** 2
    likelihood_fit = bool(config.get("romancal_ramp_fit", False))
    if likelihood_fit:
        # JUMP_KW (reference gen_cal_image.py:428 forwards it to the
        # romancal likelihood fitter): recognized keys map onto the
        # internal fitter's knobs; unrecognized ones are logged and
        # ignored rather than failing the run (romancal-internal
        # options have no analog here)
        jump_kw = dict(config.get("JUMP_KW") or {})
        rej = float(jump_kw.pop(
            "rejection_threshold", config.get("REJECTION_THRESHOLD", 4.5)
        ))
        plan_kw = {
            k: jump_kw.pop(k)
            for k in ("nu", "u_min", "u_max") if k in jump_kw
        }
        plan = likely.build_likely_plan(
            meta, exclude_first, rejection_threshold=rej, **plan_kw
        )
        if jump_kw:
            mylog.append(
                "JUMP_KW keys ignored by the internal likelihood "
                f"fitter: {sorted(jump_kw)}\n"
            )
        mylog.append("likelihood (adaptive-weight) ramp fit\n")
        weights_out = plan.W[plan.nu // 2, -1]
    else:
        plan = ramp.build_plan(
            meta, u_, exclude_first, config.get("JUMP_DETECT_PARS")
        )
        mylog.append(f"\n\nRamp fit optimized for u = {u_:11.5E} s**-1\n")
        mylog.append("weights = {}\n".format(plan.W[-1]))
        weights_out = plan.W[-1]

    # ---- static config + array bundle ----
    use_amp33 = pack.amp33_valid and "amp33" in l1
    opt_slope = calfiles.amp33_optimal_slope(pack) if use_amp33 else None
    wfi18 = bool(config.get("correct_wfi18_transient", False)) and (
        detector == "WFI18" or detector in pack.wfi18_transient
    )
    if config.get("correct_wfi18_transient", False) and not wfi18:
        mylog.append("Skipping WFI18 transient correction (not WFI18)\n")
    # per-detector taus from the optional wfi18_transient cal table
    # (defaults reproduce the historical hardcoded WFI18 model)
    wfi18_taus = tuple(
        pack.wfi18_transient.get(detector, {}).get(
            "taus", WFI18_DEFAULT_TAUS)
    )
    if wfi18:
        mylog.append(
            "WFI18 transient row basis taus = "
            + ", ".join(f"{t:.1f}" for t in wfi18_taus) + " rows\n"
        )
    has_dark_decay = "dark_decay" in caldir
    if has_dark_decay:
        tab = pack.dark_decay[detector]
        dd_signal = _dark_decay_signal(
            read_pattern, frame_time, tab["amplitude"], tab["time_constant"]
        )
        mylog.append("Dark decay correction complete\n")
    else:
        dd_signal = np.zeros(ngrp, dtype=np.float32)

    cfg = dict(
        exclude_first=exclude_first,
        backup=backup,
        use_amp33=bool(use_amp33),
        likelihood_fit=likelihood_fit,
        has_biascorr="biascorr" in caldir,
        has_dark_decay=has_dark_decay,
        wfi18=wfi18,
        first_is_reset=(read_pattern[0] == [0]),
        has_ipc="ipc4d" in caldir,
        # fused Pallas kernels (TPU only; the CPU interpreter is slow).
        # Every *_BACKEND key defaults to 'auto' = the fastest measured
        # backend for the platform (Pallas on TPU, XLA elsewhere —
        # A/B numbers in docs/performance.md).  Set 'xla' explicitly to
        # avoid cold Mosaic compiles (minutes each on a remote-compile
        # relay; seconds on a directly-attached TPU host).
        # IPC_BACKEND: 'xla', 'pallas' (blocked halo windows),
        # 'pallas-stream' (single-read ring buffer, bit-identical to
        # 'pallas') or 'pallas-frame' (raw-frame single pass, no
        # embed/unpad glue).  auto resolves to pallas-frame: honest
        # standalone stage at 4096^2x6 on v5e (r4c batch, Aug 19) —
        # frame 6.67 ms, stream 8.58, blocked slab 13.88, XLA 41.58.
        ipc_pallas=(resolve_backend(config, "IPC_BACKEND", "pallas-frame")
                    in ("pallas", "pallas-stream")),
        ipc_stream=(resolve_backend(config, "IPC_BACKEND", "pallas-frame")
                    == "pallas-stream"),
        ipc_frame=(resolve_backend(config, "IPC_BACKEND", "pallas-frame")
                   == "pallas-frame"),
        lin_pallas=(resolve_backend(config, "LIN_BACKEND") == "pallas"),
        med_pallas=(resolve_backend(config, "SKY_BACKEND") == "pallas"),
        # read-axis resultant contraction: 'dot' (XLA dot_general) or
        # 'pallas' (ops.contract_pallas streaming kernel) — consumed by
        # the sim accumulator and the noise 'P' resample.  XLA's
        # dot_general wins the A/B on TPU (16.6 vs 19.4 ms), so 'auto'
        # resolves to 'dot' everywhere.
        contract={"auto": "dot"}.get(
            str(config.get("CONTRACT_BACKEND", "dot")).lower(),
            str(config.get("CONTRACT_BACKEND", "dot")).lower()),
        # 1/f synthesis backend for the noise-engine fills (the
        # calibration core itself never draws pink noise)
        pink_pallas=(resolve_backend(config, "PINK_BACKEND") == "pallas"),
        has_dark_dq=pack.dark_dq is not None,
        skyorder=int(config.get("SKYORDER", -1)),
    )

    # trailing alignment: dark files may carry extra LEADING slices (a
    # reference read the exposure dropped under EXTRACT_REF) — the
    # reference's own noise engine documents exactly this de semantics
    # (gen_noise_image.py:107-110); its gen_cal_image indexes [j]
    # leading, which is only consistent when the counts match.
    de = pack.dark_cube.shape[0] - ngrp
    if de < 0:
        raise ValueError(
            f"dark cube has {pack.dark_cube.shape[0]} groups but the "
            f"exposure has {ngrp}"
        )
    arr = {
        "opt_slope": np.float32(opt_slope if opt_slope is not None else 0.0),
        "data": data,
        "amp33": (
            np.asarray(l1["amp33"]) if "amp33" in l1
            else np.zeros((ngrp, nside, channelwidth), np.uint16)
        ).astype(np.float32),
        "amp33_med": (
            pack.amp33_med if pack.amp33_med is not None
            else np.zeros((nside, channelwidth), np.float32)
        ),
        "dark_cube": pack.dark_cube[de:],
        "dark_slope": pack.dark_slope,
        "dark_dq": (
            pack.dark_dq if pack.dark_dq is not None
            else np.zeros((nside, nside), np.uint32)
        ),
        "gain": pack.gain,
        "read_sigma": pack.read_sigma,
        "mask_dq": mask_dq,
        "saturation": pack.saturation,
        "saturation_dq": (
            pack.saturation_dq if pack.saturation_dq is not None
            else np.zeros((nside, nside), np.uint32)
        ),
        "biascorr": (
            pack.biascorr[pack.biascorr.shape[0] - ngrp:]
            if pack.biascorr is not None
            else np.zeros((ngrp, nside - 2 * nb, nside - 2 * nb), np.float32)
        ),
        "lin_coefs": pack.lin_coefs,
        "lin_smin": pack.lin_smin,
        "lin_smax": pack.lin_smax,
        "lin_sref": pack.lin_sref,
        "lin_dq": pack.lin_dq,
        "ipc_kernel": (
            pack.ipc_kernel if pack.ipc_kernel is not None
            else np.zeros((3, 3, nside - 2 * nb, nside - 2 * nb), np.float32)
        ),
        "flat": pack.flat,
        "area_factor": area_factor,
        "dark_decay_signal": dd_signal,
        "wfi18_basis": _wfi18_row_basis(nside, wfi18_taus),
    }
    if cfg["has_ipc"]:
        # cal-only IPC work precomputed once per cal pack (see
        # ipc_precal) — the per-exposure core consumes the results
        arr["dark_slope_ipc"], arr["flat_ipc"] = ipc_precal(
            pack.flat, pack.dark_slope, pack.gain, pack.ipc_kernel, nb
        )
        if cfg["ipc_pallas"]:
            arr["ipc_kernel_padded"] = ipc_pallas.kernel_planes_padded(
                pack.ipc_kernel, th=32
            )
        if cfg["ipc_frame"]:
            arr["ipc_kernel_frame"] = ipc_pallas.kernel_planes_frame(
                pack.ipc_kernel, nside, nb
            )

    mylog.append("Saturation check complete\n")
    mylog.append("Linearity correction complete\n")
    mylog.append("Dark current subtracted\n")
    medgain = float(np.median(pack.gain))
    mylog.append(f"median gain = {medgain:8.5f} e/DN\n")

    return dict(
        arr=arr, plan=plan, cfg=cfg, geom=(nside, nborder, int(channelwidth)),
        meta=meta, read_pattern=read_pattern, frame_time=frame_time,
        uopt=uopt, weights_out=weights_out, medgain=medgain,
        has_dark_decay=has_dark_decay, wfi18=wfi18,
        exclude_first=exclude_first, log=mylog.output,
    )


def package_tree(out, prep, l1, config):
    """Package device-core outputs into the L2 ASDF tree."""
    nside, nborder, _ = prep["geom"]
    nb = nborder
    ngrp = np.asarray(l1["data"]).shape[0]
    l1meta = l1["meta"]
    meta = prep["meta"]
    medgain = prep["medgain"]
    skyorder = prep["cfg"]["skyorder"]
    has_dark_decay = prep["has_dark_decay"]
    wfi18 = prep["wfi18"]

    slope = out["slope"]
    pdq = out["pdq"]
    ser = out["slope_err_read"]
    sep = out["slope_err_poisson"]

    act = slice(nb, nside - nb)
    err = np.hypot(ser, sep).astype(np.float32)

    # WCS embedding: the reference ships the WCS inside the L2 product
    # (romanisim ``make_asdf(imwcs=repackage_wcs(thewcs))``,
    # ``gen_cal_image.py:653-662``) — downstream PyIMCOM reads it from
    # the file, not the sidecar.  The sidecar header describes the
    # active-region science frame with 0-based CRPIX (sim_to_l1 writes
    # it that way), which is exactly the frame of the L2 ``data`` array.
    thewcs = wcs_from_config(config)
    wcsinfo = None
    if thewcs is not None:
        w = wcsutils.SIPWCS.from_header(thewcs, zero_based=True)
        wcsinfo = dict(
            w.to_cards(),
            pixel_convention="0-based, active region",
            ra_ref=float(w.crval[0]),
            dec_ref=float(w.crval[1]),
        )

    l2meta = {
        "exposure": dict(l1meta["exposure"]),
        "instrument": dict(l1meta.get("instrument", {})),
        "cal_step": oututils.cal_step_status(
            has_dark_decay, wfi18,
            config.get("correct_wfi18_transient", False),
            has_wcs=wcsinfo is not None,
        ),
        "gain": medgain,
    }
    if wcsinfo is not None:
        l2meta["wcsinfo"] = wcsinfo
        if "pointing" in l1meta:
            l2meta["pointing"] = dict(l1meta["pointing"])
    oututils.add_in_provenance(l2meta)

    im2 = {
        "meta": l2meta,
        "data": np.asarray(slope[act, act], np.float32),
        "dq": np.asarray(pdq[act, act], np.uint32),
        "err": err[act, act],
        "var_poisson": np.asarray(sep[act, act] ** 2, np.float32),
        "var_rnoise": np.asarray(ser[act, act] ** 2, np.float32),
        "var_flat": np.zeros((nside - 2 * nb, nside - 2 * nb), np.float16),
        "data_withsky": np.asarray(out["slope_withsky"][act, act], np.float32),
    }
    oututils.add_in_ref_data(im2, l1, pdq, nside, nb)
    if "dumo" in out:
        im2["dumo"] = np.asarray(out["dumo"][act, act], np.float16)
        im2["chisq"] = np.asarray(out["chisq"][act, act], np.float16)

    processinfo = {
        "medsky": float(out["medsky"]),
        "medgain": medgain,
        "skyorder": skyorder,
        "skycoefs": np.asarray(out["skycoefs"], np.float32),
        "ramp_opt_pars": prep["uopt"],
        # which reference files produced this product (the reference's
        # ProcessLog reffiles intent, ``utils/processlog.py:39``)
        "reffiles": _jsonable(config.get("CALDIR", {})),
        "meta": {
            "ngrp": meta["ngrp"],
            "N": meta["N"].astype(np.int16),
            "tbar": meta["tbar"].astype(np.float32),
            "tau": meta["tau"].astype(np.float32),
            "frame_time": prep["frame_time"],
            "read_pattern": prep["read_pattern"],
            "nborder": nborder,
        },
        "weights": prep["weights_out"],
        "config": _jsonable(config),
        "log": prep["log"],
        "exclude_first": prep["exclude_first"],
    }
    if config.get("SLICEOUT", False):
        if ngrp >= 128:
            raise ValueError("too many groups")
        processinfo["endslice"] = np.asarray(out["endslice"], np.int8)

    return {"roman": im2, "processinfo": processinfo}


def _jsonable(obj):
    """Deep-copy a config into plain YAML/ASDF-serializable types."""
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    calibrateimage(load_config(argv[0]), verbose=True)


if __name__ == "__main__":
    main()
