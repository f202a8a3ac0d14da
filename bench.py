"""Headline benchmark: full-frame single-SCA L1->L2 wall-clock on TPU.

Runs the complete calibration chain (saturation, refpix, linearity, IPC
deconvolution, Casertano ramp fit + Sharma-Casertano jump detection,
dark, flat, sky fit) on a 4096^2 x ngrp ramp cube, steady-state timed.

Baseline: the reference publishes no numbers (BASELINE.md); the
driver-supplied north star is a full 18-SCA exposure in < 1 s on a
v5e-8, i.e. a per-chip budget of 8/18 s per SCA (the SCAs are
independent, so chips scale linearly).  ``vs_baseline`` is
budget / measured (>1 = faster than target).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    nside = 4096
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    cfg = dict(cfg, ipc_pallas=True)  # fused Pallas IPC kernel
    core = l1_to_l2.make_core(plan, cfg, geom)
    arr = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}

    # On the axon relay backend block_until_ready does not synchronize
    # remote execution, so time a serially-dependent scan chain and
    # difference two chain lengths (overhead cancels exactly).
    @functools.partial(jax.jit, static_argnums=1)
    def chained(arrs, n):
        def body(carry, _):
            out = core(dict(arrs, data=carry))
            carry2 = carry + (out["slope"][:1, :1].sum() * 0).astype(carry.dtype)
            return carry2, out["slope"][0, 0]

        _, ss = jax.lax.scan(body, arrs["data"], None, length=n)
        return ss

    n_lo, n_hi = 1, 5
    jax.device_get(chained(arr, n_lo))
    jax.device_get(chained(arr, n_hi))
    t0 = time.perf_counter()
    jax.device_get(chained(arr, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(chained(arr, n_hi))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)

    npix = (nside - 8) ** 2
    budget_s = 8.0 / 18.0  # per-chip share of the 18-SCA < 1 s north star
    result = {
        "metric": "single-SCA L1->L2 full calibration wall-clock (4096^2, 6 groups)",
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(budget_s / dt, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "mpix_per_s": round(npix / dt / 1e6, 1),
            "fpa_18sca_proj_s_on_8chip": round(dt * 18 / 8, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
