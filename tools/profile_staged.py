"""Prefix-differenced stage attribution for the staged exposure runner.

Times cumulative prefixes of ``make_staged_exposure_runner``'s stage
sequence (sim, fill, base cal, R layer, O layer, P layer, stack) with
the chained-key harness; consecutive differences attribute wall-clock
to each stage as actually dispatched.  Usage:

    python tools/profile_staged.py [nside]

Reference workload: ``OpenUniverse_to_L1L2.py:155-169`` (sim -> L1 ->
L2 -> noise layers).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.pipeline import noise_core, sim_to_l1
from romanimpreprocess_tpu.pipeline.noise_core import _run_layers

LAYERS = ["Rz4S2", "O", "PbrS2"]


def build(nside):
    arr, prep, pack = benchlib.exposure_bundle(nside=nside)
    pallas = jax.default_backend() != "cpu"  # CPU = harness smoke only
    # ipc_frame: production 'auto' for the CAL cores; ipc_pallas stays
    # on for the SIM core's IL forward model (padded slab) — matching
    # bench._bench_exposure
    prep = dict(
        prep,
        cfg=dict(prep["cfg"], ipc_pallas=pallas, ipc_stream=False,
                 ipc_frame=pallas, lin_pallas=pallas,
                 med_pallas=pallas, pink_pallas=pallas),
    )
    m = noise_core._staged_layer_machinery(prep, pack, None)
    cfg = prep["cfg"]
    read_pattern = m.read_pattern
    simcore = sim_to_l1._l1_core_factory(
        read_pattern, m.frame_time, cfg["has_biascorr"], cfg["has_ipc"],
        True, ipc_pallas=pallas,
    )
    fillcore_active = sim_to_l1._fill_core_factory(
        tuple(len(g) for g in read_pattern), nside, m.geom[2], m.geom[1],
        True, bool(m.do_amp33), im_is_active=True,
        pink_pallas=pallas,
    )
    # match bench._bench_exposure's HBM residency exactly: with the
    # Pallas backends on, every stage consumes only the pre-padded
    # kernel slab, so the unread raw ipc_kernel (~0.6 GB at 4096^2)
    # must not sit in HBM during the stage timings this tool exists to
    # attribute (cf. the base-cal HBM-pressure anomaly)
    drop = ("data", "biascorr", "dark_dq") + (
        ("ipc_kernel",) if pallas else ())
    arr = {k: v for k, v in arr.items() if k not in drop}
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}

    cksum = jax.jit(
        lambda k, x: jax.random.fold_in(
            k,
            jnp.where(jnp.isfinite(jnp.float32(jnp.sum(x[..., :1, :1]))),
                      1, 0).astype(jnp.int32),
        )
    )

    def prefix(key, arrs, depth, rsub=None):
        ks = m.split_keys(key)
        res, _dq = simcore(ks[0], arrs["rate"], arrs)
        if depth == 0:
            return cksum(key, res)
        im_u16, amp33_u16 = fillcore_active(
            ks[1], dict(noise_core.fill_call_arrs(arrs), im=res)
        )
        if depth == 1:
            return cksum(key, im_u16)
        arrs0 = dict(arrs, data=im_u16)
        if m.do_amp33:
            arrs0["amp33"] = m.to_f32(amp33_u16)
        del amp33_u16, res
        base = m.core_base(arrs0)
        if depth == 2:
            return cksum(key, base["slope"])
        if rsub is not None:
            # sub-stage attribution inside the first 'R' layer
            # (mirrors _run_layers' dark-reference variant)
            from romanimpreprocess_tpu.config import layer_subscript

            cmd = LAYERS[0]
            flags = layer_subscript(cmd, "R")
            lkey = m.fold(ks[2], 0)
            if "a" in flags:
                src, orig = im_u16, base["slope"]
            else:
                # dark-reference L2: a genuine per-exposure cost (the
                # refpix correction inside the core reads the
                # exposure's amp33, so it cannot be amortized across
                # exposures — mirrors _run_layers.dark_ref)
                src = m.dark_as_u16(arrs0["dark_cube"])
                orig = m.core_r(dict(arrs0, data=src))["slope"]
            if rsub == "darkref":
                return cksum(key, orig)
            new_u16, _a33 = m.perturb_fill(
                m.fold(lkey, 0), src, noise_core.fill_call_arrs(arrs0)
            )
            if rsub == "fill":
                return cksum(key, new_u16)
            arrs_r = dict(arrs0, data=new_u16)
            if m.do_amp33:
                arrs_r["amp33"] = m.to_f32(_a33)
            new = m.core_r(arrs_r)["slope"]
            if rsub == "cal":
                return cksum(key, new)
            zc = (
                float(layer_subscript(flags.upper(), "Z"))
                if "z" in flags else None
            )
            s_ord = (
                int("0" + layer_subscript(cmd, "S")) if "S" in cmd
                else None
            )
            diff = m.diff_zclip(new, orig, zc, s_ord)
            return cksum(key, diff)
        diffs = _run_layers(m, LAYERS[: depth - 2], ks[2], arrs0, base,
                            im_u16)
        if depth < 6:
            return cksum(key, diffs[-1])
        cube = m.stack_cube(*diffs)
        return cksum(key, cube)

    return m, arrs, prefix


def timed(fn, n_lo=1, n_hi=3):
    # every prefix returns a fresh key data-dependent on its last
    # product, so feeding it forward serializes the iterations
    return benchlib.timed_chain(fn, n_lo=n_lo, n_hi=n_hi, repeats=2,
                                seed=5, reduce=min)


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    mode = sys.argv[2] if len(sys.argv) > 2 else "stages"
    m, arrs, prefix = build(nside)
    if mode in ("rsub", "all"):
        # attribute the first 'R' layer's internals on top of base_cal
        prev = timed(functools.partial(
            lambda key, d: prefix(key, arrs, d), d=2))
        print(f"{'base':12s} cum {prev*1e3:8.1f} ms", flush=True)
        for sub in ("darkref", "fill", "cal", "zclip"):
            dt = timed(functools.partial(
                lambda key, s: prefix(key, arrs, 3, rsub=s), s=sub))
            print(f"+R/{sub:9s} cum {dt*1e3:8.1f} ms   stage "
                  f"{(dt - prev)*1e3:8.1f} ms", flush=True)
            prev = dt
        if mode == "rsub":
            return
    names = ["sim", "+fill", "+base_cal", "+R", "+O", "+P", "+stack"]
    prev = 0.0
    for depth, name in enumerate(names):
        dt = timed(functools.partial(
            lambda key, d: prefix(key, arrs, d), d=depth))
        print(f"{name:12s} cum {dt*1e3:8.1f} ms   stage "
              f"{(dt - prev)*1e3:8.1f} ms", flush=True)
        prev = dt

if __name__ == "__main__":
    main()
