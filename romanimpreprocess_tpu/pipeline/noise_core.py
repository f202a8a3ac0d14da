"""Fused on-device exposure noise program.

One jitted XLA program computes a full production-exposure noise stack:
base L1->L2 calibration plus every noise layer ('R' re-entries of the
calibration core, device Pearson 'O' draws, per-raw-read Poisson 'P'
resampling, 'S' sky removal) without the cube ever leaving HBM.

The reference's noise engine re-enters the file-driven pipeline through
temp files (2-3 full round trips per 'R' layer,
``gen_noise_image.py:114-154``); the host path here
(:mod:`.noise`) already replaces that with in-memory function calls,
and this module goes one step further for production/benchmark use: the
whole layer stack is a single device program, so a multi-layer exposure
costs zero host<->device transfers beyond the final (nlayers, na, na)
cube.  Statistical content of every layer matches the host engine
(gated by ``tests/test_noise_core.py``).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import layer_subscript
from ..galpoisson import get_tilde_nus
from ..galpoisson.pearson_jax import draw_from_pearson_jax
from ..ops import sky
from . import l1_to_l2, sim_to_l1
from .noise import resample_traced, weightvec_table


def fill_aux_arrays(pack, geom):
    """Host-side extra arrays the fused cores need beyond the L1->L2
    bundle (passed as jit ARGUMENTS — closing full frames over the jit
    embeds them as constants and blows the remote-compile payload)."""
    nside, nb, cw = geom
    return {
        "fill_resetnoise": np.asarray(pack.resetnoise, np.float32),
        "fill_amp33_std": (
            np.asarray(pack.amp33_std, np.float32)
            if pack.amp33_std is not None
            else np.zeros((nside, cw), np.float32)
        ),
        # per-SCA pink-noise amplitudes (from the 'read' cal file) ride
        # as runtime scalars so one compiled fill core serves every
        # detector (and mixed-SCA batches stay one machinery group)
        "fill_c_pink": np.float32(pack.c_pink),
        "fill_u_pink": np.float32(pack.u_pink),
        "fill_m_pink": np.float32(pack.amp33_m_pink),
        "fill_ru_pink": np.float32(pack.amp33_ru_pink),
    }


def fill_call_arrs(arrs):
    """The fill-core argument dict (sans ``im``) from a staged arrs
    bundle — single definition of the staged-name -> fill-name mapping
    so adding an aux plane is a one-line change, not a sweep of every
    runner/profiler call site.  Use as
    ``fillcore(key, dict(fill_call_arrs(arrs), im=im))``."""
    return {
        "read_sigma": arrs["read_sigma"],
        "resetnoise": arrs["fill_resetnoise"],
        "dark_cube": arrs["dark_cube"],
        "amp33_med": arrs["amp33_med"],
        "amp33_std": arrs["fill_amp33_std"],
        "c_pink": arrs["fill_c_pink"],
        "u_pink": arrs["fill_u_pink"],
        "m_pink": arrs["fill_m_pink"],
        "ru_pink": arrs["fill_ru_pink"],
    }


def _tilnus_table(read_pattern, weightvecs, start, frame_time):
    """Per-endslice (t21, t31, t41) scaled tilde-nus (static floats).

    Single definition shared by the fused and staged noise cores (and
    mirrored by the host engine) — the admissibility-filler fix of
    round 3 had to touch three copies of this block; now there is one.
    """
    a_beta = np.array([g[0] for g in read_pattern])
    N_beta = np.array([len(g) for g in read_pattern])
    tilnus = {}
    for i in range(start + 1, len(read_pattern)):
        if weightvecs[i] is None:
            continue
        t21, t31, t41, _ = get_tilde_nus(N_beta, a_beta, weightvecs[i])
        tilnus[i] = (
            float(t21 * frame_time),
            float(t31 * frame_time**2),
            float(t41 * frame_time**3),
        )
    return tilnus


def _pearson_o_draw(key, endslice_c, gI, gain_a, tilnus, na):
    """'O'-layer Pearson pseudo-Poisson debias draw (shared by the
    fused and staged cores).  ``key`` must already carry the layer's
    fold; the caller divides nothing — the returned draw is in DN/s.
    """
    t21m = jnp.ones((na, na), jnp.float32)
    t31m = jnp.zeros((na, na), jnp.float32)
    # truly inadmissible filler (beta2 < 0 for every physical gI) so
    # no-weight lanes never classify as a live Pearson type: a mild -1
    # lands in the type-1 region for gI > 0.5 and only the trailing
    # * hasw multiply hides the spurious draws (a NaN there would leak
    # through the mask)
    t41m = jnp.full((na, na), -1.0e12, jnp.float32)
    hasw = jnp.zeros((na, na), bool)
    for i, (t21, t31, t41) in tilnus.items():
        sel = endslice_c == i
        t21m = jnp.where(sel, t21, t21m)
        t31m = jnp.where(sel, t31, t31m)
        t41m = jnp.where(sel, t41, t41m)
        hasw = hasw | sel
    draw = draw_from_pearson_jax(key, t21m, t31m, t41m, gI)
    return draw * hasw / gain_a


def _p_layer_draw(key, endslice_c, withsky_act, gain_a, *, read_pattern,
                  weightvecs, ngrp, frame_time, med_p, contract,
                  sky_order=None, resample=False, final_sky_order=None):
    """'P'-layer resampled-Poisson diff (shared fused/staged body).

    ``sky_order``: the 'b' flag's medfit order for the sky level;
    ``resample``: the 'r' flag; ``final_sky_order``: a trailing 'S'
    fused into the same program.
    """
    if sky_order is not None:
        _, skylevel = sky.medfit(withsky_act, order=sky_order,
                                 pallas=med_p)
    else:
        skylevel = withsky_act
    if not resample:
        diff = jnp.zeros(withsky_act.shape, jnp.float32)
    else:
        e_exp = jnp.clip(skylevel * gain_a * frame_time, 0.0, None)
        diff = resample_traced(
            key, e_exp, gain_a, endslice_c, read_pattern, weightvecs,
            ngrp, contract=contract,
        )
    if final_sky_order is not None:
        _, model = sky.medfit(diff, order=final_sky_order, pallas=med_p)
        diff = diff - model
    return diff


def exposure_arrays(prep, pack, rate):
    """Full array bundle for the EXPOSURE runners from a real cal pack.

    ``prep`` is :func:`..l1_to_l2.prepare_inputs` output (built against
    any L1 tree of the target geometry/MA table), ``rate`` the (na, na)
    active-region charge rate in e/s (e.g. ``Image2D.truth_rate``).
    Combines the L1->L2 bundle (minus the ``data`` placeholder — the
    synthesized L1 replaces it), the refdata-fill aux planes, and the
    sim-side active-region cal slices ``make_l1_fullcal`` stages
    (reference ``sim_to_isim.py:163-262``).  This is the non-synthetic
    counterpart of ``benchlib.exposure_bundle``'s array assembly.
    """
    nside, nb, cw = prep["geom"]
    act = slice(nb, nside - nb)
    arr = {k: v for k, v in prep["arr"].items() if k != "data"}
    arr.update(fill_aux_arrays(pack, prep["geom"]))
    arr.update(
        rate=np.asarray(rate, np.float32),
        gain_act=np.asarray(pack.gain[act, act], np.float32),
        resetnoise_act=np.asarray(pack.resetnoise[act, act], np.float32),
        read_sigma_act=np.asarray(pack.read_sigma[act, act], np.float32),
        dark_slope_act=np.asarray(pack.dark_slope[act, act], np.float32),
        biascorr_t0=np.float32(pack.biascorr_t0),
    )
    return arr


def make_exposure_noise_core(prep, pack, layers, config=None, jit=True):
    """Build the fused (base L2 + noise layers) device core.

    ``prep`` is :func:`l1_to_l2.prepare_inputs` output for the base L1
    tree; ``layers`` is the NOISE LAYER command list (static).  Returns
    ``run(key, arrs) -> (noise_cube (nlayers, na, na), base_out)`` —
    jitted unless ``jit=False`` (trace-level, for embedding in a larger
    program); ``arrs`` is ``prep["arr"]`` staged to device.
    """
    config = config or {}
    plan, cfg, geom = prep["plan"], prep["cfg"], prep["geom"]
    if "CONTRACT_BACKEND" in config:
        # run-config override for preps built without the run config
        # (e.g. benchlib bundles)
        cfg = dict(cfg, contract={"auto": "dot"}.get(
            str(config["CONTRACT_BACKEND"]).lower(),
            str(config["CONTRACT_BACKEND"]).lower()))
    nside, nb, cw = geom
    na = nside - 2 * nb
    act = slice(nb, nside - nb)
    read_pattern = prep["read_pattern"]
    frame_time = float(prep["frame_time"])
    ngrp = len(read_pattern)
    nvec = np.asarray([len(g) for g in read_pattern], np.float32)

    # the shared cached core (cal_cfg-stripped key) — a fresh
    # make_core here would re-trace a program byte-identical to one
    # already compiled for the staged path
    core = l1_to_l2._get_core(plan, cfg, geom)
    med_p = bool(cfg.get("med_pallas", False))

    # static per-endslice weight vectors + tilde-nus
    weightvecs, start = weightvec_table(
        prep["meta"]["tbar"], prep["weights_out"], ngrp,
        cfg["exclude_first"],
    )
    tilnus = _tilnus_table(read_pattern, weightvecs, start, frame_time)

    do_amp33 = cfg["use_amp33"]
    fillcore = sim_to_l1._fill_core_factory(
        tuple(len(g) for g in read_pattern), nside, cw, nb, True,
        bool(do_amp33), im_is_active=True,
        pink_pallas=cfg.get("pink_pallas", False),
    )
    def _layer_R(lkey, cmd, arrs, base, endslice_c):
        flags = layer_subscript(cmd, "R")
        if "a" not in flags:
            # reference run: dark cube pushed through the pipeline
            # (uint16-quantized exactly as the host engine writes it)
            data_ref = jnp.clip(arrs["dark_cube"], 0, 65535).astype(
                jnp.uint16
            )
            ref_out = core(dict(arrs, data=data_ref))
            orig = ref_out["slope"][act, act]
            src = data_ref[:, act, act].astype(jnp.float32)
        else:
            orig = base["slope"][act, act]
            src = arrs["data"][:, act, act].astype(jnp.float32)

        kw, kf = jax.random.split(jax.random.fold_in(lkey, 0))
        white = (
            jax.random.normal(kw, (ngrp, na, na), dtype=jnp.bfloat16
                              ).astype(jnp.float32)
            * arrs["read_sigma"][act, act][None]
            / jnp.sqrt(jnp.asarray(nvec))[:, None, None]
        )
        # active region only: the fill overwrites the border strips
        im_act = jnp.clip(jnp.round(src + white), 0, 65535)
        im_u16, amp33_u16 = fillcore(
            kf,
            dict(fill_call_arrs(arrs), im=im_act),
        )
        new_arrs = dict(arrs, data=im_u16)
        if do_amp33:
            new_arrs["amp33"] = amp33_u16.astype(jnp.float32)
        new_out = core(new_arrs)
        diff = new_out["slope"][act, act] - orig

        if "z" in flags:
            zclip = float(layer_subscript(flags.upper(), "Z"))
            q25, med, q75 = sky.bisect_quantiles(diff, (0.25, 0.5, 0.75))
            iqr = q75 - q25
            diff = jnp.clip(
                diff,
                med - zclip * iqr / 1.34896,
                med + zclip * iqr / 1.34896,
            )
        return diff

    def _layer_O(lkey, arrs, base, endslice_c, gain_a):
        gI = gain_a * base["slope_withsky"][act, act]
        return _pearson_o_draw(
            jax.random.fold_in(lkey, 2), endslice_c, gI, gain_a, tilnus,
            na,
        )

    def _layer_P(lkey, cmd, base, endslice_c, gain_a):
        flags = layer_subscript(cmd, "P")
        so = (
            int("0" + layer_subscript(flags.upper(), "B"))
            if "b" in flags else None
        )
        return _p_layer_draw(
            jax.random.fold_in(lkey, 1), endslice_c,
            base["slope_withsky"][act, act], gain_a,
            read_pattern=read_pattern, weightvecs=weightvecs, ngrp=ngrp,
            frame_time=frame_time, med_p=med_p,
            contract=cfg.get("contract", "dot"),
            sky_order=so, resample="r" in flags,
        )

    def run(key, arrs):
        base = core(arrs)
        es = base["endslice"].astype(jnp.int32)
        endslice_c = jnp.where(es > 0, es, ngrp - 1)
        gain_a = jnp.clip(arrs["gain"], 1e-4, 1e4)[act, act]

        diffs = []
        for i_noise, cmd in enumerate(layers):
            lkey = jax.random.fold_in(key, i_noise)
            diff = jnp.zeros((na, na), jnp.float32)
            if "R" in cmd:
                diff = diff + _layer_R(lkey, cmd, arrs, base, endslice_c)
            if "O" in cmd:
                diff = diff + _layer_O(lkey, arrs, base, endslice_c, gain_a)
            if "P" in cmd:
                diff = diff + _layer_P(lkey, cmd, base, endslice_c, gain_a)
            if "S" in cmd:
                sky_order = int("0" + layer_subscript(cmd, "S"))
                _, model = sky.medfit(diff, order=sky_order,
                                      pallas=med_p)
                diff = diff - model
            diffs.append(diff)
        return jnp.stack(diffs), base

    return jax.jit(run) if jit else run


class _StagedMachinery:
    """Shared per-layer jitted stages for the staged runners (one
    compiled calibration core, re-dispatched; intermediates stay on
    device).  Built by :func:`_staged_layer_machinery`."""


_MACHINERY_CACHE = {}


def _staged_layer_machinery(prep, pack, config, mesh=None):
    """``mesh=None``: single-SCA stages (one jit each).  With a
    ``("sca",)`` :class:`jax.sharding.Mesh`, every stage is instead
    ``jit(vmap(stage))`` with outputs sharded over the mesh axis — the
    focal-plane production form, where one dispatch per stage drives
    every chip and each chip holds its shard of SCAs (the per-SCA math
    is identical; SURVEY.md §2.4's embarrassingly-parallel structure).

    Machinery is cached by content: runners built for different layer
    SETS over the same (plan, cfg, geometry, MA table, cal constants)
    reuse the same jitted stage objects — without this, every
    ``make_staged_*_runner`` call would re-jit (and on the TPU relay,
    re-remote-compile) programs identical to ones already built.
    """
    config = config or {}
    plan, cfg, geom = prep["plan"], prep["cfg"], prep["geom"]
    if "CONTRACT_BACKEND" in config:
        # run-config override for preps built without the run config
        # (e.g. benchlib bundles)
        cfg = dict(cfg, contract={"auto": "dot"}.get(
            str(config["CONTRACT_BACKEND"]).lower(),
            str(config["CONTRACT_BACKEND"]).lower()))
    cache_key = (
        l1_to_l2.core_key(plan, cfg, geom),
        tuple(tuple(g) for g in prep["read_pattern"]),
        float(prep["frame_time"]),
        np.asarray(prep["weights_out"], np.float64).tobytes(),
        np.asarray(prep["meta"]["tbar"], np.float64).tobytes(),
        # NOT the pink amplitudes: they ride in arrs as runtime
        # scalars, so machinery is shared across detectors
        mesh,  # jax Mesh is hashable (device identity + axis names)
    )
    if cache_key in _MACHINERY_CACHE:
        return _MACHINERY_CACHE[cache_key]
    m = _StagedMachinery()
    m.cfg = cfg
    nside, nb, cw = geom
    na = nside - 2 * nb
    act = slice(nb, nside - nb)
    read_pattern = prep["read_pattern"]
    frame_time = float(prep["frame_time"])
    ngrp = len(read_pattern)
    nvec = np.asarray([len(g) for g in read_pattern], np.float32)
    m.geom, m.na, m.act, m.ngrp = geom, na, act, ngrp
    m.read_pattern, m.frame_time = read_pattern, frame_time

    med_p = bool(cfg.get("med_pallas", False))

    # ---- stage wrapper: single-SCA jit, or (mesh set) jit(vmap(...))
    # with outputs sharded over the ("sca",) axis ----
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _spec = NamedSharding(mesh, PartitionSpec("sca"))

    def _wrap(fn, statics=(), in_axes=0, shard_out=True):
        if mesh is None:
            if statics:
                return jax.jit(fn, static_argnames=statics)
            return jax.jit(fn)
        jkw = {"out_shardings": _spec} if shard_out else {}
        if not statics:
            return jax.jit(jax.vmap(fn, in_axes=in_axes), **jkw)
        cache = {}

        def call(*args, **kwargs):
            skey = tuple(kwargs.pop(k, None) for k in statics)
            assert not kwargs, f"unexpected kwargs: {kwargs}"
            if skey not in cache:
                bound = functools.partial(fn, **dict(zip(statics, skey)))
                cache[skey] = jax.jit(
                    jax.vmap(bound, in_axes=in_axes), **jkw
                )
            return cache[skey](*args)

        return call

    m.wrap = _wrap
    # identity-keyed cache for wrapping EXTERNALLY cached cores (the
    # sim/fill/cal factories return singletons): without it every
    # make_staged_*_runner call in the mesh path would build a fresh
    # jit(vmap(core)) — a new trace, and on the TPU relay a fresh
    # multi-minute remote compile, per runner construction.  Entries
    # hold a strong ref to the wrapped fn so a live id can't be
    # recycled.
    m._wrapped = {}

    def _wrap_cached(fn):
        hit = m._wrapped.get(id(fn))
        if hit is None or hit[0] is not fn:
            hit = (fn, _wrap(fn))
            m._wrapped[id(fn)] = hit
        return hit[1]

    m.wrap_cached = _wrap_cached
    # Batched lane keys are DERIVED from one exposure key, never taken
    # from the caller: under vmap the rbg bit generator draws the whole
    # batch from lane 0's key (the other lanes get counter-extended
    # streams and their key values are IGNORED — verified on jax 0.8;
    # see jax's PRNG design notes on non-threefry impls).  Accepting a
    # caller key array would silently correlate realizations whose
    # lane-0 keys collide.  Streams are deterministic per
    # (key, n_sca, backend) and independent across lanes; lane 0's
    # stream is bit-identical to a single-SCA run with
    # split(key, n)[0] (float outputs then agree to vmap
    # reduction-order drift, integer DQ exactly).
    m.lane_keys = jax.jit(
        lambda key, n: jax.random.split(key, n), static_argnames="n"
    )
    # noise-layer 'R' re-entries consume ONLY the slope — a restricted-
    # output core lets XLA dead-code-eliminate the error/variance maps,
    # the smooth-mode sky diagnostic, and the dq packaging of those
    # re-runs (~25% of the calibration core's wall clock)
    core_r_1 = l1_to_l2._get_core(
        plan, dict(cfg, outputs=("slope",)), geom
    )
    # the base calibration feeding the layers needs only these four
    core_base_1 = l1_to_l2._get_core(
        plan,
        dict(cfg, outputs=("slope", "slope_withsky", "endslice", "pdq")),
        geom,
    )
    if mesh is None:
        m.core_r, m.core_base = core_r_1, core_base_1
    else:
        m.core_r = _wrap(core_r_1)
        m.core_base = _wrap(core_base_1)
    do_amp33 = m.do_amp33 = cfg["use_amp33"]
    fillcore_act = sim_to_l1._fill_core_factory(
        tuple(len(g) for g in read_pattern), nside, cw, nb, True,
        bool(do_amp33), im_is_active=True,
        pink_pallas=cfg.get("pink_pallas", False),
    )

    weightvecs, start = weightvec_table(
        prep["meta"]["tbar"], prep["weights_out"], ngrp,
        cfg["exclude_first"],
    )
    tilnus = _tilnus_table(read_pattern, weightvecs, start, frame_time)

    # ---- small jitted stages (args only; no large closures) ----
    def split_keys(key):
        ks = jax.random.split(key, 8)
        # a tuple (not a stacked array) so batched callers index the
        # same way: ks[i] is one key, or one key per SCA under vmap
        return tuple(ks[i] for i in range(8))

    def perturb_fill(key, src_u16, fa):
        """White read noise + full refdata/1-f/amp33 refill in ONE
        stage (the f32 intermediate dies inside the jit instead of
        sitting in HBM between two dispatches).  Only the ACTIVE
        region of ``src_u16`` is read — the fill core overwrites the
        reference border with fresh strip noise anyway, so the
        full-frame f32 embed would be dead work."""
        kw, kf = jax.random.split(key)
        src = src_u16[:, act, act].astype(jnp.float32)
        # bf16 normals: see the sim core's read-noise note (the white
        # perturbation is rounded back to integer DN below)
        white = (
            jax.random.normal(kw, (ngrp, na, na), dtype=jnp.bfloat16
                              ).astype(jnp.float32)
            * fa["read_sigma"][act, act][None]
            / jnp.sqrt(jnp.asarray(nvec))[:, None, None]
        )
        im_act = jnp.clip(jnp.round(src + white), 0, 65535)
        return fillcore_act(kf, dict(fa, im=im_act))

    def dark_as_u16(dark_cube):
        return jnp.clip(dark_cube, 0, 65535).astype(jnp.uint16)

    def diff_zclip(new_slope, orig_slope, zclip=None, sky_order=None):
        diff = new_slope[act, act] - orig_slope[act, act]
        if zclip is not None:
            q25, med, q75 = sky.bisect_quantiles(diff, (0.25, 0.5, 0.75))
            iqr = q75 - q25
            diff = jnp.clip(
                diff,
                med - zclip * iqr / 1.34896,
                med + zclip * iqr / 1.34896,
            )
        if sky_order is not None:
            # trailing 'S' of a pure-'R' layer fused into the same
            # program (one dispatch, no extra diff materialization)
            _, model = sky.medfit(diff, order=sky_order, pallas=med_p)
            diff = diff - model
        return diff

    def r_cal_diff(arrs, orig_slope, zclip=None, sky_order=None):
        """'R'-layer re-calibration fused with its difference pass:
        slope-only core + diff + z-clip (+ fused trailing-'S' medfit)
        in ONE program, so the re-run's slope never round-trips HBM
        between dispatches and the relay pays one dispatch instead of
        two per layer (reference semantics:
        ``gen_noise_image.py:98-170`` recalibrate-then-difference)."""
        return diff_zclip(core_r_1(arrs)["slope"], orig_slope,
                          zclip=zclip, sky_order=sky_order)

    def o_layer(key, endslice, withsky, gain):
        gain_a = jnp.clip(gain, 1e-4, 1e4)[act, act]
        es = endslice.astype(jnp.int32)
        endslice_c = jnp.where(es > 0, es, ngrp - 1)
        gI = gain_a * withsky[act, act]
        return _pearson_o_draw(
            jax.random.fold_in(key, 2), endslice_c, gI, gain_a, tilnus,
            na,
        )

    def p_layer(key, endslice, withsky, gain, sky_order=None,
                resample=False, final_sky_order=None):
        gain_a = jnp.clip(gain, 1e-4, 1e4)[act, act]
        es = endslice.astype(jnp.int32)
        endslice_c = jnp.where(es > 0, es, ngrp - 1)
        return _p_layer_draw(
            jax.random.fold_in(key, 1), endslice_c, withsky[act, act],
            gain_a, read_pattern=read_pattern, weightvecs=weightvecs,
            ngrp=ngrp, frame_time=frame_time, med_p=med_p,
            contract=cfg.get("contract", "dot"), sky_order=sky_order,
            resample=resample, final_sky_order=final_sky_order,
        )

    def s_layer(diff, sky_order=None):
        _, model = sky.medfit(diff, order=sky_order, pallas=med_p)
        return diff - model

    def final_checksum(key, cube):
        s = cube.sum()
        return jax.random.fold_in(
            key, jnp.where(jnp.isfinite(s), 1, 0).astype(jnp.int32)
        ), s

    # every op between stages goes through a jit — eager dispatch is
    # unreliable on the axon relay backend
    m.split_keys = _wrap(split_keys, shard_out=False)
    m.perturb_fill = _wrap(perturb_fill)
    m.dark_as_u16 = _wrap(dark_as_u16)
    m.diff_zclip = _wrap(diff_zclip, statics=("zclip", "sky_order"))
    m.r_cal_diff = _wrap(r_cal_diff, statics=("zclip", "sky_order"))
    m.o_layer = _wrap(o_layer)
    m.p_layer = _wrap(
        p_layer, statics=("sky_order", "resample", "final_sky_order")
    )
    m.s_layer = _wrap(s_layer, statics=("sky_order",))
    m.final_checksum = _wrap(final_checksum, shard_out=False)
    m.fold = _wrap(jax.random.fold_in, in_axes=(0, None),
                   shard_out=False)
    m.to_f32 = _wrap(lambda x: x.astype(jnp.float32))
    m.add2 = _wrap(lambda a, b: a + b)
    m.stack_cube = _wrap(lambda *ds: jnp.stack(ds))
    # shaped off the (na, na) endslice map so the batched form needs no
    # static batch size
    m.zeros_na = _wrap(lambda es: jnp.zeros(es.shape, jnp.float32))
    # dark-reference L2 cache: the non-'a' 'R' layers calibrate the
    # dark cube itself.  The slope is NOT exposure-independent — the
    # refpix correction inside the core reads the exposure's RNG-drawn
    # amp33 — so entries are keyed by (dark_cube, amp33) identity and
    # hold strong refs to both (a live entry's ids can't be recycled).
    # Reuse is therefore across layers within one run(), never across
    # runs with different keys (which would make run(k2)'s output
    # depend on which keys ran before it).
    m._dark_ref_cache = {}
    _MACHINERY_CACHE[cache_key] = m
    return m


def _run_layers(m, layers, layer_key, arrs0, base, im_u16):
    """The staged per-layer loop shared by the runners.

    ``layer_key``: base RNG key; each layer folds its index (never a
    fixed modulo pool — with >6 layers that would bit-correlate layers
    6/0 and 7/1).  ``arrs0``: staged array bundle whose ``data`` is the
    base L1 cube; ``im_u16``: the base L1 cube (source for 'Ra' adds).
    Returns the list of (na, na) device diffs.
    """
    fold = m.fold
    core = m.core_r  # 'R' re-entries need only the slope (see above)

    def dark_ref(arrs0):
        amp33 = arrs0.get("amp33")
        ck = (id(arrs0["dark_cube"]), id(amp33))
        hit = m._dark_ref_cache.get(ck)
        if (
            hit is not None
            and hit[0] is arrs0["dark_cube"]
            and hit[1] is amp33
        ):
            return hit[2], hit[3]
        data_ref = m.dark_as_u16(arrs0["dark_cube"])
        ref_out = core(dict(arrs0, data=data_ref))
        m._dark_ref_cache.clear()  # hold at most one run's worth
        m._dark_ref_cache[ck] = (
            arrs0["dark_cube"], amp33, data_ref, ref_out["slope"]
        )
        return data_ref, ref_out["slope"]

    diffs = []
    for i_noise, cmd in enumerate(layers):
        lkey = fold(layer_key, i_noise)
        comps = [c for c in "ROP" if c in cmd]
        s_ord = (
            int("0" + layer_subscript(cmd, "S")) if "S" in cmd else None
        )
        # a single-component 'R' or 'P' layer fuses its trailing 'S'
        # medfit into that component's program; other layers apply it
        # to the summed diff via the standalone s_layer stage
        fuse_s = s_ord if comps in (["R"], ["P"]) else None
        diff = None
        if "R" in cmd:
            flags = layer_subscript(cmd, "R")
            if "a" not in flags:
                src, orig = dark_ref(arrs0)
            else:
                orig = base["slope"]
                src = im_u16
            new_u16, new_a33 = m.perturb_fill(
                fold(lkey, 0), src, fill_call_arrs(arrs0)
            )
            del src
            arrs_r = dict(arrs0, data=new_u16)
            if m.do_amp33:
                arrs_r["amp33"] = m.to_f32(new_a33)
            del new_a33
            zc = (
                float(layer_subscript(flags.upper(), "Z"))
                if "z" in flags else None
            )
            # fused re-cal + diff/z-clip: one dispatch per layer (the
            # re-run's slope dies inside the program instead of
            # round-tripping HBM between two dispatches)
            diff = m.r_cal_diff(arrs_r, orig, zclip=zc, sky_order=fuse_s)
            del arrs_r, new_u16, orig
        if "O" in cmd:
            d = m.o_layer(fold(lkey, 2), base["endslice"],
                          base["slope_withsky"], arrs0["gain"])
            diff = d if diff is None else m.add2(diff, d)
        if "P" in cmd:
            flags = layer_subscript(cmd, "P")
            so = (
                int("0" + layer_subscript(flags.upper(), "B"))
                if "b" in flags else None
            )
            d = m.p_layer(
                fold(lkey, 3), base["endslice"],
                base["slope_withsky"], arrs0["gain"],
                sky_order=so, resample="r" in flags,
                final_sky_order=fuse_s,
            )
            diff = d if diff is None else m.add2(diff, d)
        if diff is None:
            diff = m.zeros_na(base["endslice"])
        if s_ord is not None and fuse_s is None:
            diff = m.s_layer(diff, sky_order=s_ord)
        diffs.append(diff)
    return diffs


def make_staged_exposure_runner(prep, pack, layers, config=None,
                                mesh=None):
    """Host-staged full exposure: the same math as
    :func:`make_full_exposure_core`, issued as a handful of separately
    jitted stages instead of one fused program.

    Why it exists: the fused single-program form inlines the
    calibration core three times (base + two 'R'-layer re-entries),
    which the remote TPU compile service handles poorly at 4096^2
    (>40 min).  Here the core is compiled ONCE and re-dispatched; all
    intermediates stay on device (dispatch is async, nothing transfers
    to the host), so device work and HBM residency are identical.

    Returns ``run(key, arrs) -> (noise_cube, base_out, checksum)`` —
    all device arrays; ``checksum`` is a scalar data-dependent on every
    layer, so fetching it synchronizes the whole exposure (the axon
    relay's ``block_until_ready`` does not).

    With ``mesh`` (a ``("sca",)`` device mesh) every stage runs batched
    over a leading SCA axis sharded across the mesh: ``key`` stays ONE
    exposure-level key (per-SCA streams are derived internally — see
    the lane_keys note in :func:`_staged_layer_machinery`; a caller key
    array would be silently ignored beyond lane 0 by the batched rbg
    generator) and every leaf of ``arrs`` gains a leading SCA axis
    (see :func:`..parallel.shard_batch`).  This is the focal-plane
    production form of the reference's per-SCA Slurm array
    (``OpenUniverse_to_L1L2.py:155-169`` x 18 tasks) — one host process,
    one dispatch per stage, every chip computing its SCA shard.
    """
    m = _staged_layer_machinery(prep, pack, config, mesh=mesh)
    nside, nb, cw = m.geom
    read_pattern = m.read_pattern
    cfg = m.cfg  # incl. any config-level backend overrides
    # the sim must model the same biascorr the calibration subtracts
    # (reference make_l1_fullcal adds it, sim_to_isim.py:256-258) —
    # benchlib packs have none, real cal packs may
    simcore = sim_to_l1._l1_core_factory(
        read_pattern, m.frame_time, cfg["has_biascorr"], cfg["has_ipc"],
        True, ipc_pallas=cfg.get("ipc_pallas", False),
        contract=cfg.get("contract", "dot"),
    )
    fillcore_active = sim_to_l1._fill_core_factory(
        tuple(len(g) for g in read_pattern), nside, cw, nb, True,
        bool(m.do_amp33), im_is_active=True,
        pink_pallas=cfg.get("pink_pallas", False),
    )
    if mesh is not None:
        # wrap through the machinery's identity cache: the factories
        # return cached singletons, so repeat runner constructions
        # (e.g. one per exposure in a batch sweep) re-dispatch the same
        # jit(vmap(...)) objects instead of re-tracing
        simcore = m.wrap_cached(simcore)
        fillcore_active = m.wrap_cached(fillcore_active)

    def run(key, arrs):
        if mesh is not None:
            key = m.lane_keys(key, n=arrs["rate"].shape[0])
        ks = m.split_keys(key)
        res, _l1dq = simcore(ks[0], arrs["rate"], arrs)
        im_u16, amp33_u16 = fillcore_active(
            ks[1],
            dict(fill_call_arrs(arrs), im=res),
        )
        arrs0 = dict(arrs, data=im_u16)
        if m.do_amp33:
            arrs0["amp33"] = m.to_f32(amp33_u16)
        del amp33_u16, res
        # restricted-output base core: only what the layers (and the
        # exposure-runner contract) consume is computed or materialized
        base = m.core_base(arrs0)

        diffs = _run_layers(m, layers, ks[2], arrs0, base, im_u16)
        cube = m.stack_cube(*diffs)
        _, checksum = m.final_checksum(key, cube)
        return cube, base, checksum

    return run


def make_staged_noise_runner(prep, pack, layers, config=None, mesh=None):
    """Device-resident noise stack for an EXISTING L1 exposure (the
    config-driven ``generate_all_noise`` path).

    The host engine (:func:`..noise.make_noise_cube`) round-trips the
    perturbed ~1 GB cube to the host once per 'R' layer (white-noise
    add in numpy, re-staging through ``calibrate_tree``); here the cube
    is staged once and every layer runs as re-dispatches of the same
    compiled stages the exposure runner uses — only the final
    (nlayers, na, na) cube leaves the device.

    Returns ``run(key, arrs) -> (noise_cube, base_out, checksum)``;
    ``arrs`` is ``prep["arr"] | fill_aux_arrays(pack, geom)`` staged to
    device (``data`` = the base L1 cube, uint16).  ``mesh``: see
    :func:`make_staged_exposure_runner` (batched-over-SCAs form).
    """
    m = _staged_layer_machinery(prep, pack, config, mesh=mesh)

    def run(key, arrs):
        if mesh is not None:
            key = m.lane_keys(key, n=arrs["data"].shape[0])
        base = m.core_base(arrs)
        diffs = _run_layers(m, layers, key, arrs, base, arrs["data"])
        cube = m.stack_cube(*diffs)
        _, checksum = m.final_checksum(key, cube)
        return cube, base, checksum

    return run


def make_full_exposure_core(prep, pack, layers, config=None):
    """One XLA program for a full production exposure:

        rate map -> L1 synthesis (Poisson/CR accumulation, IL forward
        model, read noise) -> reference-pixel/1-f/amp33 fill ->
        L1->L2 calibration -> every noise layer.

    This is the reference's per-exposure production workload
    (``runs/summer2025run/OpenUniverse_to_L1L2.py:155-169``: sim ->
    calibrate -> noise) as a single jitted device function — no files,
    no host round trips.  Returns ``run(key, arrs) -> (noise_cube,
    base_out)`` where ``arrs`` additionally carries the sim-side
    bundle: ``rate`` (na, na) e/s plus the active-region cal slices
    (``gain_act``, ``resetnoise_act``, ``read_sigma_act``,
    ``dark_slope_act``, ``biascorr_t0``).
    """
    plan, cfg, geom = prep["plan"], prep["cfg"], prep["geom"]
    nside, nb, cw = geom
    read_pattern = prep["read_pattern"]
    frame_time = float(prep["frame_time"])

    noise_run = make_exposure_noise_core(prep, pack, layers, config,
                                         jit=False)
    simcore = sim_to_l1._l1_core_factory(
        read_pattern, frame_time, cfg["has_biascorr"], cfg["has_ipc"],
        True, ipc_pallas=cfg.get("ipc_pallas", False),
        contract=cfg.get("contract", "dot"),
    )
    do_amp33 = cfg["use_amp33"]
    fillcore = sim_to_l1._fill_core_factory(
        tuple(len(g) for g in read_pattern), nside, cw, nb, True,
        bool(do_amp33), im_is_active=True,
        pink_pallas=cfg.get("pink_pallas", False),
    )
    @jax.jit
    def run(key, arrs):
        ks, kf, kn = jax.random.split(key, 3)
        res, _l1dq = simcore(ks, arrs["rate"], arrs)
        im_u16, amp33_u16 = fillcore(
            kf,
            dict(fill_call_arrs(arrs), im=res),
        )
        arrs2 = dict(arrs, data=im_u16)
        if do_amp33:
            arrs2["amp33"] = amp33_u16.astype(jnp.float32)
        return noise_run(kn, arrs2)

    return run
