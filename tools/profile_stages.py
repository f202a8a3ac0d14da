"""Per-stage wall-clock profile of the L1->L2 calibration core on TPU.

Each stage is timed with the same serially-dependent chained-scan
differencing bench.py uses (block_until_ready does not synchronize on
the axon relay backend).  Arrays are passed as jit arguments to keep
remote-compile payloads small.

Usage: python tools/profile_stages.py [nside]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.dqflags import group as gdq
from romanimpreprocess_tpu.ops import ipc, ipc_pallas, linearity, ramp, saturation, sky
from romanimpreprocess_tpu.ops import mask
from romanimpreprocess_tpu.pipeline.l1_to_l2 import _refpix_correct


def timed(fn, arrs, data0, n_lo=1, n_hi=9):
    """Wall-clock per iteration of ``fn(data, arrs) -> output pytree``
    via the shared consume-all-enforcing harness (benchlib.scan_chain):
    the harness checksums EVERY output leaf inside the chain, so a
    stage cannot be dead-code-eliminated below what it returns."""
    return benchlib.scan_chain(fn, arrs, data0, n_lo=n_lo, n_hi=n_hi)[0]


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    nside_, nb, chw = geom
    ngrp = arr["data"].shape[0]
    # frame-resident IPC kernel planes precomputed on host (the cal-
    # pack-cached fast path production uses; an in-jit embed would be
    # timed as part of the stage)
    arr["ipc_kernel_frame"] = ipc_pallas.kernel_planes_frame(
        arr["ipc_kernel"], nside_, nb)
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}
    data0 = arrs["data"].astype(jnp.float32)
    rdq0 = jnp.zeros(data0.shape, jnp.uint32)
    pdq0 = arrs["mask_dq"].astype(jnp.uint32)

    stages = {}

    def st_saturation(data, a):
        rdq, pdq = saturation.flag_saturation(
            data, rdq0, pdq0, a["saturation"], a["saturation_dq"],
            backup=cfg["backup"], skip_first=1, n_pix_grow_sat=1)
        return rdq, pdq

    def st_refpix(data, a):
        out = _refpix_correct(
            data, a["dark_cube"], a["amp33"], a["amp33_med"],
            a["opt_slope"], nside_, nb, chw, cfg["use_amp33"])
        return out

    def st_linearity(data, a):
        lin = linearity.LinearityData(
            a["lin_coefs"], a["lin_smin"], a["lin_smax"],
            a["lin_sref"], a["lin_dq"])
        out, dq = linearity.apply_linearity_cube(
            data, lin, do_not_flag_first=cfg["first_is_reset"],
            attempt_corr=jnp.ones(data.shape, bool))
        return out, dq

    def st_ipc_pallas(data, a):
        gain_act = a["gain"][nb:-nb, nb:-nb]
        stacked = jnp.concatenate([
            data[:, nb:-nb, nb:-nb] * gain_act[None],
            (a["dark_slope"][nb:-nb, nb:-nb] * gain_act)[None],
            (a["flat"][nb:-nb, nb:-nb] * gain_act)[None]])
        return ipc_pallas.ipc_rev2_cube_blocked(stacked, a["ipc_kernel"])

    def st_ipc_stream(data, a):
        gain_act = a["gain"][nb:-nb, nb:-nb]
        stacked = jnp.concatenate([
            data[:, nb:-nb, nb:-nb] * gain_act[None],
            (a["dark_slope"][nb:-nb, nb:-nb] * gain_act)[None],
            (a["flat"][nb:-nb, nb:-nb] * gain_act)[None]])
        return ipc_pallas.ipc_rev2_cube_stream(stacked, a["ipc_kernel"],
                                              th=32, vmem_mb=128)

    def st_ipc_frame(data, a):
        return ipc_pallas.ipc_rev2_frame_stream(
            data, a["ipc_kernel_frame"], a["gain"], nborder=nb,
            th=32, vmem_mb=128)

    def st_ipc_xla(data, a):
        gain_act = a["gain"][nb:-nb, nb:-nb]
        stacked = jnp.concatenate([
            data[:, nb:-nb, nb:-nb] * gain_act[None],
            (a["dark_slope"][nb:-nb, nb:-nb] * gain_act)[None],
            (a["flat"][nb:-nb, nb:-nb] * gain_act)[None]])
        return ipc.ipc_rev(stacked, a["ipc_kernel"])

    def st_ramp(data, a):
        slope, ser, sep, rdq, pdq = ramp.ramp_fit(
            data, rdq0, pdq0, plan, a["gain"], a["read_sigma"], nborder=nb)
        return slope, ser, sep, rdq, pdq

    def st_sky(data, a):
        slope = data[0]
        m = mask.PixelMask1.build(pdq0)
        medsky, _ = sky.smooth_mode(
            sky.binkxk(jnp.where(~m, slope, jnp.nan), 4))
        skycoefs, skymodel = sky.medfit(
            slope[nb:-nb, nb:-nb], order=cfg["skyorder"])
        return medsky, skycoefs, skymodel

    for name, f in [
        ("saturation", st_saturation),
        ("refpix", st_refpix),
        ("linearity", st_linearity),
        ("ipc_pallas", st_ipc_pallas),
        ("ipc_stream", st_ipc_stream),
        ("ipc_frame", st_ipc_frame),
        ("ipc_xla", st_ipc_xla),
        ("ramp_fit", st_ramp),
        ("sky", st_sky),
    ]:
        dt = timed(f, arrs, data0)
        stages[name] = round(dt * 1e3, 2)
        print(f"{name:12s} {dt * 1e3:8.2f} ms", flush=True)

    print(json.dumps({"nside": nside, "ngrp": ngrp, "stages_ms": stages}))




def main_sky():
    """Sub-profile of the sky stage components."""
    nside = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    nside_, nb, _ = geom
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}
    data0 = arrs["data"].astype(jnp.float32)
    pdq0 = arrs["mask_dq"].astype(jnp.uint32)

    def st_maskbuild(data, a):
        return mask.PixelMask1.build(pdq0 | data[0, :, :].astype(jnp.uint32))

    def st_smooth(data, a):
        m = mask.PixelMask1.build(pdq0)
        return sky.smooth_mode(
            sky.binkxk(jnp.where(~m, data[0], jnp.nan), 4))

    def st_medfit(data, a):
        return sky.medfit(data[0, nb:-nb, nb:-nb], order=cfg["skyorder"])

    out = {}
    for name, f in [
        ("mask_build", st_maskbuild),
        ("mask+smooth_mode", st_smooth),
        ("medfit", st_medfit),
    ]:
        dt = timed(f, arrs, data0)
        out[name] = round(dt * 1e3, 2)
        print(f"{name:18s} {dt * 1e3:8.2f} ms", flush=True)
    print(json.dumps(out))




def main_ablate():
    """Marginal in-core stage costs: full core minus one stage each.

    The fused core's XLA graph elides work that standalone stage
    timings count, so marginal (ablation) numbers are the truthful
    attribution.  The chain consumes a full-frame sum of every output
    (matching bench.py's honest checksum): each variant times the
    complete L2 product, so a marginal is exactly the stage's cost in
    the program users run.
    """
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    nside = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    # production 'auto' baseline: frame-resident IPC (see l1_to_l2's
    # IPC_BACKEND note); the slab/stream variants below measure back
    cfg = dict(cfg, ipc_frame=True)
    from romanimpreprocess_tpu.ops import ipc_pallas as _ipcp

    arr["ipc_kernel_padded"] = _ipcp.kernel_planes_padded(
        arr["ipc_kernel"], th=32)
    arr["ipc_kernel_frame"] = _ipcp.kernel_planes_frame(
        arr["ipc_kernel"], geom[0], geom[1])
    del arr["ipc_kernel"]
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}

    def timed_core(core, n_lo=1, n_hi=9):
        # benchlib.scan_chain checksums EVERY output leaf inside the
        # chain: consuming only slope[0,0] lets XLA slice the whole
        # frame away in variants where no full-frame reduction (medfit)
        # remains — the old "minus medfit = 2.7 ms" marginal was that
        # DCE artifact, not a stage attribution
        return benchlib.scan_chain(
            lambda data, a: core(dict(a, data=data)), arrs,
            arrs["data"], n_lo=n_lo, n_hi=n_hi)[0]

    base = timed_core(l1_to_l2.make_core(plan, cfg, geom))
    print(f"{'full':14s} {base * 1e3:8.2f} ms", flush=True)
    out = {"full": round(base * 1e3, 2)}
    variants = [
        ("saturation",), ("refpix",), ("linearity",), ("ipc",), ("sky",),
        ("smooth",), ("medfit",), ("lin_pallas",), ("ipc_slab",),
        ("ipc_stream",), ("med_pallas",),
    ]
    swap = {("lin_pallas",): dict(lin_pallas=True),
            ("ipc_slab",): dict(ipc_frame=False, ipc_pallas=True),
            ("ipc_stream",): dict(ipc_frame=False, ipc_pallas=True,
                                  ipc_stream=True),
            ("med_pallas",): dict(med_pallas=True)}
    for v in variants:
        if v in swap:
            c = dict(cfg, **swap[v])
        else:
            c = dict(cfg, ablate=v)
        dt = timed_core(l1_to_l2.make_core(plan, c, geom))
        tag = "+".join(v)
        label = tag if v in swap else "minus " + tag
        delta = (dt - base) if v in swap else (base - dt)
        print(f"{label:14s} {dt * 1e3:8.2f} ms  (marginal {delta * 1e3:+7.2f})",
              flush=True)
        out[label] = round(dt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sky":
        main_sky()
    elif len(sys.argv) > 1 and sys.argv[1] == "ablate":
        main_ablate()
    else:
        main()
