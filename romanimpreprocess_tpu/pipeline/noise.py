"""Monte-Carlo noise realizations: the ``gen_noise_image`` equivalent.

Re-implements the reference's noise engine
(``L1_to_L2/gen_noise_image.py:60-400``): alternative L1 realizations
pushed through the full L1->L2 pipeline and differenced to produce
"noise only" slope images, controlled by the layer mini-DSL
(``'Rz4S2C1'``, ``'O'``, ``'Prb2'``; spec
``docs/L1_to_L2_README.rst:207-239``).

Structural win vs the reference: the reference writes each perturbed L1
to a temp file and re-invokes the file-driven pipeline (2-3 full
file round trips per 'R' layer, ``gen_noise_image.py:114-154``); here
the perturbed cube is handed to :func:`l1_to_l2.calibrate_tree` in
memory and the jitted calibration core is reused across realizations.

Layer commands (capital letter + lower-case/numeric arguments):

- ``R``   : read-noise realization (white + 1/f + amp33); ``a`` = add to
  the science data (default replaces it with the dark cube); ``z<num>``
  = IQR clipping of the difference at ``<num>`` pseudo-sigma.
- ``O``   : Pearson pseudo-Poisson debiasing draws per endslice class.
- ``P``   : re-sampled Poisson noise; ``b<order>`` = sky-only (medfit of
  given order); ``r`` = per-raw-read resampling.
- ``S<order>`` : subtract the medfit sky of the given order.
- ``C...``: comment (ignored).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import pars
from ..config import layer_subscript, load_config
from ..galpoisson import draw_from_pearson, get_tilde_nus
from ..galpoisson.pearson_jax import draw_from_pearson_jax
from ..io import asdf_lite, calfiles, fits_lite
from ..ops import rand, sky
from . import l1_to_l2, sim_to_l1

_medfit_j = jax.jit(sky.medfit, static_argnames=("N", "order"))


_normal_j = jax.jit(
    jax.random.normal, static_argnames=("shape",)
)


def weightvec_table(tbar, weights_last, ngrp, exclude_first):
    """Per-endslice ramp-fit weight vectors (reference
    ``gen_noise_image.py:185-208``): the full-ramp optimal weights for
    the last slice, two-point CDS-style vectors for truncated ramps."""
    start = 1 if exclude_first else 0
    weightvecs = [None] * ngrp
    weightvecs[ngrp - 1] = np.asarray(weights_last, np.float32)
    tbar = np.asarray(tbar, np.float64)
    for iend in range(start + 2, ngrp):
        Kt = np.zeros(ngrp, dtype=np.float32)
        Kt[iend - 1] = 1.0 / (tbar[iend - 1] - tbar[start])
        Kt[start] = -Kt[iend - 1]
        weightvecs[iend - 1] = Kt
    return weightvecs, start


def _weightvecs_and_endslice(processinfo, ngrp):
    """Weight vectors + clipped endslice map from a base-L2 tree."""
    weightvecs, start = weightvec_table(
        processinfo["meta"]["tbar"], processinfo["weights"], ngrp,
        processinfo["exclude_first"],
    )
    endslice = np.asarray(processinfo["endslice"])
    endslice = np.where(endslice > 0, endslice, ngrp - 1)
    return weightvecs, endslice, start


def resample_traced(key, e_exp, gain_d, endslice_d, read_pattern,
                    weightvecs, ngrp, contract="dot"):
    """Trace-level per-raw-read Poisson resampling contracted by
    per-pixel endslice weights (reference 'P...r',
    ``gen_noise_image.py:268-322``).  ``read_pattern``/``weightvecs``
    are static; call under jit.

    Execution shape: ONE bulk Poisson draw over all reads (the sampler
    shares its pmf/PTRS constants across frames at a common rate map)
    and one MXU contraction with the cumulative-membership matrix
    T[j, r] = |{reads of group j with index >= r}| / N_j — the same
    trick as the sim accumulator — instead of a serial per-read
    fori_loop (which re-ran the 40-step CDF recurrence per read:
    80 -> ~25 ms at 4096^2 on v5e).
    """
    lastsamp = read_pattern[-1][-1]
    nreads = lastsamp + 1
    n = e_exp.shape[0]

    # dres[j] = sum_{r in grp j} wgt_j * cum_r = sum_r T[j, r] * delta_r
    T = np.zeros((ngrp, nreads), np.float64)
    for j, grp in enumerate(read_pattern):
        for r in grp:
            T[j, : r + 1] += 1.0 / len(grp)

    # Fold the resultant contraction AND the per-endslice ramp-fit
    # weights into ONE read-axis matrix: the per-pixel output is
    #   out = sum_j wv[es][j] * sum_r T[j, r] * (inc_r - e)/g
    #       = (sum_r M[es, r] * inc_r  -  (sum_r M[es, r]) * e) / g
    # with M[es] = wv[es] @ T.  This removes the (nreads, n, n)
    # delta pass (~2.3 GB of HBM traffic at 4096^2), the (ngrp, n, n)
    # dres intermediate, and the ngrp separate tensordot passes over
    # it — the draw feeds a single (ngrp, nreads) contraction.
    M = np.zeros((ngrp, nreads), np.float64)
    for es in range(ngrp):
        if weightvecs[es] is not None:
            M[es] = np.asarray(weightvecs[es], np.float64) @ T
    M_d = jnp.asarray(M, jnp.float32)
    Msum = jnp.asarray(M.sum(axis=1), jnp.float32)

    # one (nreads, n, n) draw — a single rand.poisson call shares the
    # pmf/PTRS constants across all reads (per-chunk calls recompute
    # them and measured 2x slower; see sim_to_l1._accumulate_resultants)
    incs = rand.poisson(key, e_exp, shape=(nreads, n, n))
    if contract == "pallas":
        from ..ops import contract_pallas

        contrib = contract_pallas.contract_reads(M_d, incs)
        # per-pixel selection by endslice (select-chain, no gather)
        out = jnp.zeros((n, n), jnp.float32)
        for es in range(ngrp):
            if weightvecs[es] is None:
                continue
            out = out + jnp.where(
                endslice_d == es,
                (contrib[es] - Msum[es] * e_exp) / gain_d, 0.0,
            )
        return out
    # Per-pixel endslice selection folded INTO the read accumulation:
    # out(p) = sum_r M[es(p), r] * X_r(p).  Only ONE of the ngrp
    # contraction outputs survives per pixel, so materializing the
    # (ngrp, n, n) contrib (an M=6, K=14 "matmul" XLA runs far off the
    # bandwidth floor: acc_dot 16.6 ms vs a ~2 ms traffic floor at
    # 4096^2 on v5e) and then select-chaining it is dead work.  The
    # per-read weight is a static-scalar select-chain on the endslice
    # map; the whole expression is one fused elementwise pass that
    # reads each Poisson frame exactly once.
    masks = [(es, endslice_d == es) for es in range(ngrp)
             if weightvecs[es] is not None]
    M_np = np.asarray(M, np.float32)
    Msum_np = np.asarray(M.sum(axis=1), np.float32)
    wsum_p = jnp.zeros((n, n), jnp.float32)
    for es, mk in masks:
        wsum_p = wsum_p + jnp.where(mk, Msum_np[es], 0.0)
    out = jnp.zeros((n, n), jnp.float32)
    for r in range(nreads):
        w_r = jnp.zeros((n, n), jnp.float32)
        for es, mk in masks:
            w_r = w_r + jnp.where(mk, M_np[es, r], 0.0)
        out = out + w_r * incs[r]
    return (out - wsum_p * e_exp) / gain_d


_RESAMPLE_CACHE = {}


def _poisson_resample_layer(key, e_per_slice, gain, read_pattern, weightvecs,
                            endslice, ngrp, contract="dot"):
    """Host entry for the 'P...r' layer: cached jit over
    :func:`resample_traced` (re-jitting per call would recompile)."""
    rp_t = tuple(tuple(g) for g in read_pattern)
    wv_t = tuple(
        None if w is None else tuple(np.asarray(w, np.float32).tolist())
        for w in weightvecs
    )
    cache_key = (rp_t, wv_t, ngrp, e_per_slice.shape, contract)
    if cache_key not in _RESAMPLE_CACHE:
        wv = [None if w is None else np.asarray(w, np.float32)
              for w in wv_t]
        _RESAMPLE_CACHE[cache_key] = jax.jit(
            lambda e, g, es, k: resample_traced(
                k, e, g, es, [list(t) for t in rp_t], wv, ngrp,
                contract=contract,
            )
        )
    run = _RESAMPLE_CACHE[cache_key]
    return np.asarray(
        run(jnp.asarray(e_per_slice), jnp.asarray(gain),
            jnp.asarray(endslice), key)
    )


def make_noise_cube(config, seed=None, *, pack=None, base_l1=None,
                    base_l2=None):
    """Build the (N_layers, nside_active, nside_active) noise cube.

    ``pack`` / ``base_l1`` / ``base_l2`` may be passed in memory (the
    bench and in-process pipelines use this); by default they load from
    the config's CALDIR / IN / OUT paths as in the reference.

    Backend: by default the layer stack runs **device-resident**
    (``noise_core.make_staged_noise_runner`` — the cube is staged once
    and every layer is a re-dispatch of compiled stages; only the final
    (nlayers, na, na) cube transfers back).  ``NOISE: {BACKEND: host}``
    or ``PEARSON_BACKEND: host`` selects the host-staged engine (numpy
    white noise + per-layer ``calibrate_tree`` re-entry), which is also
    the fallback if the device path raises.
    """
    nz = config.get("NOISE", {})
    backend = str(nz.get("BACKEND", "device")).lower()
    pearson_host = str(nz.get("PEARSON_BACKEND", "jax")).lower() == "host"
    if backend == "device-strict" and pearson_host:
        # contradictory: the host Pearson sampler only exists in the
        # host engine, which strict mode forbids falling back to
        raise ValueError(
            "NOISE BACKEND 'device-strict' cannot be combined with "
            "PEARSON_BACKEND 'host' (the host sampler runs only in the "
            "host engine)"
        )
    if backend != "host" and not pearson_host:
        try:
            return _make_noise_cube_device(
                config, seed, pack=pack, base_l1=base_l1, base_l2=base_l2
            )
        except Exception as e:
            if backend == "device-strict":
                raise
            print(f"device noise path failed ({e!r}); "
                  "falling back to host engine", file=sys.stderr)
    return _make_noise_cube_host(
        config, seed, pack=pack, base_l1=base_l1, base_l2=base_l2
    )


def _make_noise_cube_device(config, seed=None, *, pack=None, base_l1=None,
                            base_l2=None):
    """Device-resident noise stack (see :func:`make_noise_cube`)."""
    from . import noise_core  # local import (noise_core imports us)

    seed = int(config["NOISE"]["SEED"] if seed is None else seed)
    key = rand.sim_key(seed)
    if pack is None:
        pack = calfiles.load_caldir_cached(config["CALDIR"])
    if base_l1 is None:
        base_l1 = asdf_lite.open(config["IN"])["roman"]
    if base_l2 is None:
        base_l2 = asdf_lite.open(config["OUT"])
    if "endslice" not in base_l2["processinfo"]:
        # same contract as the reference/host path: the base L2 must
        # have been produced with SLICEOUT=True
        raise ValueError(
            "noise generation requires the base L2 run with SLICEOUT=True"
        )
    layers = list(config["NOISE"]["LAYER"])
    area_factor = l1_to_l2.area_factor_from_config(config, pack.nside)
    prep = l1_to_l2.prepare_inputs(base_l1, config, pack, area_factor)

    # no runner-level cache: make_staged_noise_runner is a thin closure
    # over noise_core's content-keyed _MACHINERY_CACHE, which dedupes
    # all jitted stages — a second cache with its own near-identical
    # key definition is a drift hazard (the W.sum() collision class)
    run = noise_core.make_staged_noise_runner(prep, pack, layers, config)

    arrs = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in {
            **prep["arr"],
            **noise_core.fill_aux_arrays(pack, prep["geom"]),
        }.items()
    }
    cube, _base, checksum = run(key, arrs)
    float(checksum)  # scalar fetch synchronizes the whole layer stack
    return np.asarray(cube, dtype=np.float32)


def _make_noise_cube_host(config, seed=None, *, pack=None, base_l1=None,
                          base_l2=None):
    """Host-staged noise engine (numpy perturbation + in-memory
    ``calibrate_tree`` re-entry per layer; reference semantics)."""
    seed = int(config["NOISE"]["SEED"] if seed is None else seed)
    key = rand.sim_key(seed)
    rng = np.random.default_rng(seed)

    if pack is None:
        pack = calfiles.load_caldir_cached(config["CALDIR"])
    nside = pack.nside
    nb = pars.nborder
    na = nside - 2 * nb
    act = slice(nb, nside - nb)
    area_factor = l1_to_l2.area_factor_from_config(config, nside)

    if base_l1 is None:
        base_l1 = asdf_lite.open(config["IN"])["roman"]
    if base_l2 is None:
        base_l2 = asdf_lite.open(config["OUT"])
    if "endslice" not in base_l2["processinfo"]:
        raise ValueError(
            "noise generation requires the base L2 run with SLICEOUT=True"
        )

    layers = config["NOISE"]["LAYER"]
    noiseimage = np.zeros((len(layers), na, na), dtype=np.float32)

    read_pattern = [list(g) for g in base_l1["meta"]["exposure"]["read_pattern"]]
    ngrp = len(read_pattern)
    frame_time = float(
        base_l1["meta"]["exposure"].get("frame_time", pars.read_time)
    )
    nvec = np.asarray([len(g) for g in read_pattern], np.float32)
    cw = (
        np.asarray(base_l1["amp33"]).shape[-1]
        if "amp33" in base_l1 else max(nside // 32, 4)
    )

    dark_ref = None  # (dark_u16, calibrated slope), loop-invariant

    for i_noise, cmd in enumerate(layers):
        lkey = jax.random.fold_in(key, i_noise)
        # shallow copy: layers only REASSIGN top-level keys (data,
        # amp33); a deepcopy would memcpy the ~1 GB cube per layer
        mytree = dict(base_l1)
        diff = np.zeros((na, na), dtype=np.float32)

        if "R" in cmd:
            flags = layer_subscript(cmd, "R")

            if "a" not in flags:
                # reference run: the dark cube pushed through the
                # pipeline.  Loop-INVARIANT (no RNG in calibrate_tree;
                # the cube/config/amp33 don't change across layers), so
                # compute once — the default production set is 8 non-'a'
                # 'R' layers, and re-running it per layer would nearly
                # double this host path's calibration count (the device
                # path caches the same way, noise_core._dark_ref_cache)
                if dark_ref is None:
                    de = pack.dark_cube.shape[0] - ngrp
                    if de not in (0, 1):
                        raise ValueError(
                            "Dark data cube has the wrong shape.")
                    dark_u16 = np.clip(
                        pack.dark_cube[de:], 0, 65535
                    ).astype(np.uint16)
                    ref_tree, _ = l1_to_l2.calibrate_tree(
                        dict(mytree, data=dark_u16), config, pack,
                        area_factor,
                    )
                    dark_ref = (
                        dark_u16, np.asarray(ref_tree["roman"]["data"])
                    )
                mytree["data"], orig_data = dark_ref
            else:
                orig_data = np.asarray(base_l2["roman"]["data"])

            # white read noise on the active region, then a full
            # reference-pixel / 1-f / amp33 refill
            kw, kf = jax.random.split(jax.random.fold_in(lkey, 0))
            data = mytree["data"].astype(np.float32)
            # jitted draw: eager dispatch is randomly UNIMPLEMENTED on
            # the axon relay, and this host path is the automatic
            # fallback when the device path fails
            white = np.asarray(
                _normal_j(kw, (ngrp, na, na))
            ) * pack.read_sigma[act, act][None] / np.sqrt(nvec)[:, None, None]
            data[:, act, act] = np.clip(
                np.round(data[:, act, act] + white), 0, 65535
            )
            im_u16, amp33_u16 = sim_to_l1.fill_in_refdata_and_1f(
                kf, jnp.asarray(data), pack, read_pattern, nside, int(cw),
                fill_in_banding=True,
                amp33=(np.zeros(1) if ("amp33" in mytree and pack.amp33_valid)
                       else None),
                nborder=nb,
            )
            mytree["data"] = np.asarray(im_u16)
            if amp33_u16 is not None:
                mytree["amp33"] = np.asarray(amp33_u16)

            new_tree, _ = l1_to_l2.calibrate_tree(
                mytree, config, pack, area_factor
            )
            diff = (
                np.asarray(new_tree["roman"]["data"]) - orig_data
            ).astype(np.float32)

            if "z" in flags:
                zclip = float(layer_subscript(flags.upper(), "Z"))
                iqr = np.percentile(diff, 75) - np.percentile(diff, 25)
                med = np.percentile(diff, 50)
                diff = np.clip(
                    diff, med - zclip * iqr / 1.34896, med + zclip * iqr / 1.34896
                )

        if "O" in cmd:
            gain = np.clip(pack.gain, 1e-4, 1e4)
            d = (gain.shape[-1] - na) // 2
            gain_a = gain[d:-d, d:-d] if d > 0 else gain
            gI = gain_a * np.asarray(base_l2["roman"]["data_withsky"])

            weightvecs, endslice, start = _weightvecs_and_endslice(
                base_l2["processinfo"], ngrp
            )
            a_beta = np.array([g[0] for g in read_pattern])
            N_beta = np.array([len(g) for g in read_pattern])

            # per-endslice-class tilde-nus (tiny host linalg); the
            # draw itself runs on device for every class in one jitted
            # program (SURVEY.md §7.5) unless PEARSON_BACKEND=host
            tilnus = {}
            for i in range(start + 1, ngrp):
                if weightvecs[i] is None:
                    continue
                t21, t31, t41, t42 = get_tilde_nus(N_beta, a_beta, weightvecs[i])
                tilnus[i] = (t21 * frame_time, t31 * frame_time**2,
                             t41 * frame_time**3)

            backend = str(
                config.get("NOISE", {}).get("PEARSON_BACKEND", "jax")
            ).lower()
            if backend == "host":
                noise_array = np.zeros((na, na), dtype=np.float32)
                for i, (t21, t31, t41) in tilnus.items():
                    pix = np.where(endslice == i)
                    if len(pix[0]) == 0:
                        continue
                    noise_array[pix] = draw_from_pearson(
                        t21, t31, t41, gI[pix], rng=rng
                    )
            else:
                # per-pixel tilnu maps by endslice class (host
                # metadata-scale select; classes <= ngrp)
                t21m = np.zeros((na, na), np.float32)
                t31m = np.zeros((na, na), np.float32)
                # filler must be TRULY inadmissible for every clipped
                # intensity (beta2 < 0), so no-weight lanes never
                # dispatch a sampler; a mild t41=-1 filler actually
                # lands in the type-1 region for gI > 0.5 and only the
                # trailing * hasw mask hid the spurious draws
                t41m = np.full((na, na), -1.0e12, np.float32)
                hasw = np.zeros((na, na), bool)
                for i, (t21, t31, t41) in tilnus.items():
                    sel = endslice == i
                    t21m[sel], t31m[sel], t41m[sel] = t21, t31, t41
                    hasw[sel] = True
                t21m[~hasw] = 1.0  # keep beta formulas finite
                noise_array = np.asarray(
                    draw_from_pearson_jax(
                        jax.random.fold_in(lkey, 2), t21m, t31m, t41m,
                        jnp.asarray(gI, jnp.float32),
                    )
                ) * hasw
            diff += noise_array / gain_a

        if "P" in cmd:
            flags = layer_subscript(cmd, "P")
            if "b" in flags:
                sky_order = int("0" + layer_subscript(flags.upper(), "B"))
                _, skylevel = _medfit_j(
                    jnp.asarray(base_l2["roman"]["data_withsky"]),
                    order=sky_order,
                )
                skylevel = np.asarray(skylevel)
            else:
                skylevel = np.asarray(base_l2["roman"]["data_withsky"]).copy()

            weightvecs, endslice, start = _weightvecs_and_endslice(
                base_l2["processinfo"], ngrp
            )

            if "r" in flags:
                gain = np.clip(pack.gain, 1e-4, 1e4)
                d = (gain.shape[-1] - na) // 2
                gain_a = gain[d:-d, d:-d] if d > 0 else gain
                e_per_slice = np.clip(
                    skylevel * gain_a * frame_time, 0.0, None
                ).astype(np.float32)
                diff += _poisson_resample_layer(
                    jax.random.fold_in(lkey, 1), e_per_slice, gain_a,
                    read_pattern, weightvecs, endslice, ngrp,
                    contract={"auto": "dot"}.get(
                        str(config.get("CONTRACT_BACKEND", "dot")).lower(),
                        str(config.get("CONTRACT_BACKEND", "dot")).lower()),
                )

        if "S" in cmd:
            sky_order = int("0" + layer_subscript(cmd, "S"))
            _, model = _medfit_j(jnp.asarray(diff), order=sky_order)
            diff = diff - np.asarray(model)

        noiseimage[i_noise] = diff

    return noiseimage


def generate_all_noise(config):
    """Driver: build the noise cube and write the output ASDF (and
    optional FITS).  Reference: ``gen_noise_image.generate_all_noise:334``.
    """
    noiseimage = make_noise_cube(config)

    if "NOISE_PRECISION" in config:
        if config["NOISE_PRECISION"] == 16:
            noiseimage = noiseimage.astype(np.float16)
        if config["NOISE_PRECISION"] not in (16, 32):
            raise ValueError("Unsupported noise precision.")

    tree = {"config": l1_to_l2._jsonable(config), "noise": noiseimage}
    asdf_lite.AsdfFile(tree).write_to(config["NOISE"]["OUT"])
    if config.get("FITSOUT", False):
        fits_lite.PrimaryHDU(noiseimage.astype(np.float32)).writeto(
            config["NOISE"]["OUT"][:-5] + "_asdf_to.fits", overwrite=True
        )


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    config = load_config(argv[0])
    l1_to_l2.calibrateimage(config | {"SLICEOUT": True})
    generate_all_noise(config)


if __name__ == "__main__":
    main()
