"""Per-component wall-clock profile of the sim->L1 synthesis on TPU.

Times the jitted pieces of ``sim_to_l1``'s L1 core with the chained-
scan differencing harness (``tools/profile_stages.py``): the batched
Poisson accumulation, the IL forward model (ipc_fwd + 24-iter
bisection), read noise, the full core, and the reference-pixel /
1-f / amp33 fill.

Usage: python tools/profile_sim.py [nside]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.ops import ipc, linearity, rand
from romanimpreprocess_tpu.pipeline import sim_to_l1


def timed(fn, arrs, key, n_lo=1, n_hi=5):
    """Wall-clock per iteration of ``fn(key, arrs) -> output pytree``
    via the shared consume-all-enforcing harness (benchlib.scan_chain):
    every stage's COMPLETE output is checksummed inside the chain, so
    XLA cannot dead-code-eliminate any of it (the pre-Aug-20 version of
    this tool consumed one pixel per stage — every number it printed
    timed a sliced program)."""
    return benchlib.scan_chain(fn, arrs, key, n_lo=n_lo, n_hi=n_hi,
                               advance=benchlib.key_advance)[0]


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rp = benchlib.READ_PATTERN_DEFAULT
    ngrp = len(rp)
    nreads = rp[-1][-1] + 1
    ft = 3.04
    na = nside - 8
    nb = 4
    act = slice(nb, nside - nb)

    cal = benchlib.synth_cal_arrays(nside, rp)
    arrs = {
        "gain": cal["gain"],
        "gain_act": cal["gain"][act, act],
        "resetnoise_act": cal["resetnoise"][act, act],
        "read_sigma_act": cal["read_sigma"][act, act],
        "dark_slope_act": cal["dark_slope"][act, act],
        "lin_coefs": cal["lin_coefs"],
        "lin_smin": cal["lin_smin"],
        "lin_smax": cal["lin_smax"],
        "lin_sref": cal["lin_sref"],
        "lin_dq": cal["lin_dq"],
        "ipc_kernel": cal["ipc_kernel"],
        "biascorr": np.zeros((ngrp, na, na), np.float32),
        "biascorr_t0": np.float32(0.0),
        "rate": np.full((na, na), 3.0, np.float32),
        "res_e": np.cumsum(
            np.full((ngrp, na, na), 3.0 * ft, np.float32), axis=0
        ),
    }
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arrs.items()}
    key = rand.sim_key(0)

    out = {}

    def report(name, fn):
        dt = timed(fn, arrs, key)
        out[name] = round(dt * 1e3, 2)
        print(f"{name:22s} {dt * 1e3:8.2f} ms", flush=True)

    # 1. Poisson increments alone: nreads x na x na draws at lam = rate*ft
    def st_poisson(k, a):
        lam = jnp.clip(a["rate"] * ft, 0.0, None)
        return rand.poisson(k, lam, shape=(nreads, na, na))

    # 2. accumulation (poisson + CR + T matmul)
    def st_accum(k, a):
        lam = jnp.clip(a["rate"] * ft, 0.0, None)
        res, crh = sim_to_l1._accumulate_resultants(
            k, lam, rp, {"frame_time": ft}
        )
        return res, crh

    # 3. IL forward model alone on a fixed resultant stack
    def st_il(k, a):
        lin = linearity.LinearityData(
            a["lin_coefs"], a["lin_smin"], a["lin_smax"], a["lin_sref"],
            a["lin_dq"],
        )
        il = sim_to_l1.IL(lin, a["gain"], a["ipc_kernel"], start_e=0.0)
        return il.apply(a["res_e"] + jax.random.uniform(k, (1, 1, 1)))

    # 3b. the bisection alone (no IPC)
    def st_invlin(k, a):
        lin = linearity.LinearityData(
            a["lin_coefs"][:, act, act], a["lin_smin"][act, act],
            a["lin_smax"][act, act], a["lin_sref"][act, act],
            a["lin_dq"][act, act],
        )
        x = a["res_e"] + jax.random.uniform(k, (1, 1, 1))
        return linearity.invert_linearity(x / a["gain_act"], lin)

    # 3c. ipc_fwd alone
    def st_ipcfwd(k, a):
        x = a["res_e"] + jax.random.uniform(k, (1, 1, 1))
        return ipc.ipc_fwd(x, a["ipc_kernel"])

    # 2b. accumulation without CR injection (isolates the event scatter)
    def st_accum_nocr(k, a):
        lam = jnp.clip(a["rate"] * ft, 0.0, None)
        return sim_to_l1._accumulate_resultants(k, lam, rp, None)

    # 4. read-noise draw alone
    def st_readnoise(k, a):
        nvec = jnp.asarray([len(g) for g in rp], jnp.float32)
        rn = (
            jax.random.normal(k, (ngrp, na, na))
            * a["read_sigma_act"][None]
            / jnp.sqrt(nvec)[:, None, None]
        )
        return rn

    # 5. full L1 core.  On the Pallas path stage the PRE-PADDED kernel
    # slab exactly as production does (benchlib/bench _bench_sim) —
    # without it the core re-pads the raw kernel inside the jit every
    # dispatch (~0.6 GB materialization), inflating l1_core_full
    # relative to the path it is meant to attribute.
    pallas = jax.default_backend() != "cpu"
    if pallas:
        from romanimpreprocess_tpu.ops import ipc_pallas as _ipcp

        arrs["ipc_kernel_padded"] = jax.device_put(jnp.asarray(
            _ipcp.kernel_planes_padded(cal["ipc_kernel"], th=32)))
    core = sim_to_l1._l1_core_factory(
        rp, ft, False, True, True, ipc_pallas=pallas)

    def st_full(k, a):
        return core(k, a["rate"], a)

    report("poisson_draws", st_poisson)
    report("accumulate(+CR,T)", st_accum)
    report("accumulate(noCR)", st_accum_nocr)
    report("il_forward(full)", st_il)
    report("invlinearity_only", st_invlin)
    report("ipc_fwd_only", st_ipcfwd)
    report("read_noise", st_readnoise)
    report("l1_core_full", st_full)

    print(json.dumps({"nside": nside, "ngrp": ngrp, "nreads": nreads,
                      "stages_ms": out}))


if __name__ == "__main__":
    main()
