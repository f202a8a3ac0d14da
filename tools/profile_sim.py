"""Per-component wall-clock profile of the sim->L1 synthesis on TPU.

Times the jitted pieces of ``sim_to_l1``'s L1 core with the chained-
scan differencing harness (``tools/profile_stages.py``): the batched
Poisson accumulation, the IL forward model (ipc_fwd + 24-iter
bisection), read noise, the full core, and the reference-pixel /
1-f / amp33 fill.

Usage: python tools/profile_sim.py [nside]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.io.calfiles import CalPack
from romanimpreprocess_tpu.ops import ipc, linearity, rand
from romanimpreprocess_tpu.pipeline import sim_to_l1


def timed(fn, arrs, key, n_lo=1, n_hi=5):
    """Wall-clock per iteration of fn(key, arrs) -> f32 scalar; the key
    is folded per step so iterations stay serially dependent."""

    @functools.partial(jax.jit, static_argnums=2)
    def chained(key, arrs, n):
        def body(carry, _):
            k = jax.random.fold_in(carry, 0)
            s = fn(k, arrs)
            # fold the result into the key to serialize the chain
            k = jax.random.fold_in(k, (s * 0).astype(jnp.int32) + 1)
            return k, s

        _, ss = jax.lax.scan(body, key, None, length=n)
        return ss

    jax.device_get(chained(key, arrs, n_lo))
    jax.device_get(chained(key, arrs, n_hi))
    t0 = time.perf_counter()
    jax.device_get(chained(key, arrs, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(chained(key, arrs, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


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
        incs = rand.poisson(k, lam, shape=(nreads, na, na))
        return incs[0, 0, 0]

    # 2. accumulation (poisson + CR + T matmul)
    def st_accum(k, a):
        lam = jnp.clip(a["rate"] * ft, 0.0, None)
        res, crh = sim_to_l1._accumulate_resultants(
            k, lam, rp, {"frame_time": ft}
        )
        # crh is per-GROUP since the per-group CR-flag change; take a
        # scalar element whatever its rank
        return res[0, 0, 0] + jnp.ravel(crh)[0].astype(jnp.float32)

    # 3. IL forward model alone on a fixed resultant stack
    def st_il(k, a):
        lin = linearity.LinearityData(
            a["lin_coefs"], a["lin_smin"], a["lin_smax"], a["lin_sref"],
            a["lin_dq"],
        )
        il = sim_to_l1.IL(lin, a["gain"], a["ipc_kernel"], start_e=0.0)
        S = il.apply(a["res_e"] + jax.random.uniform(k, (1, 1, 1)))
        return S[0, 0, 0]

    # 3b. the bisection alone (no IPC)
    def st_invlin(k, a):
        lin = linearity.LinearityData(
            a["lin_coefs"][:, act, act], a["lin_smin"][act, act],
            a["lin_smax"][act, act], a["lin_sref"][act, act],
            a["lin_dq"][act, act],
        )
        x = a["res_e"] + jax.random.uniform(k, (1, 1, 1))
        S, _ = linearity.invert_linearity(x / a["gain_act"], lin)
        return S[0, 0, 0]

    # 3c. ipc_fwd alone
    def st_ipcfwd(k, a):
        x = a["res_e"] + jax.random.uniform(k, (1, 1, 1))
        y = ipc.ipc_fwd(x, a["ipc_kernel"])
        return y[0, 0, 0]

    # 2b. accumulation without CR injection (isolates the event scatter)
    def st_accum_nocr(k, a):
        lam = jnp.clip(a["rate"] * ft, 0.0, None)
        res, crh = sim_to_l1._accumulate_resultants(k, lam, rp, None)
        return res[0, 0, 0] + jnp.ravel(crh)[0].astype(jnp.float32)

    # 4. read-noise draw alone
    def st_readnoise(k, a):
        nvec = jnp.asarray([len(g) for g in rp], jnp.float32)
        rn = (
            jax.random.normal(k, (ngrp, na, na))
            * a["read_sigma_act"][None]
            / jnp.sqrt(nvec)[:, None, None]
        )
        return rn[0, 0, 0]

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
        res, dq = core(k, a["rate"], a)
        return res[0, 0, 0] + dq[0, 0, 0].astype(jnp.float32)

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
