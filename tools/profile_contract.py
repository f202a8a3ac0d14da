"""A/B the resultant contraction variants on hardware.

Times, at full frame (nreads=14 -> ngrp=6 via the default read
pattern's cumulative-membership matrix):

- ``poisson``     — the bulk per-read draw alone (baseline to subtract)
- ``acc_dot``     — draw + XLA dot_general contraction (current sim path)
- ``acc_pallas``  — draw + ops.contract_pallas.contract_reads
- ``acc_fused``   — draw + the noise 'P' layer's fused form: per-pixel
  endslice selection folded into the read accumulation (one elementwise
  pass, no (ngrp, n, n) contrib materialized) — pipeline.noise
  ``resample_traced``'s default path

Usage: python tools/profile_contract.py [nside]
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.ops import contract_pallas, rand


def timed(fn, n_lo=1, n_hi=4):
    return benchlib.timed_chain(fn, n_lo=n_lo, n_hi=n_hi, repeats=3,
                                seed=11, reduce=np.median)


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    na = nside - 8
    rp = benchlib.READ_PATTERN_DEFAULT
    nreads = rp[-1][-1] + 1
    ngrp = len(rp)
    T = np.zeros((ngrp, nreads), np.float64)
    for j, grp in enumerate(rp):
        for r in grp:
            T[j, : r + 1] += 1.0 / len(grp)
    T[:, 0] = 0.0
    T_d = jax.device_put(jnp.asarray(T, jnp.float32))
    rate = jax.device_put(jnp.full((na, na), 2.7, jnp.float32))

    @jax.jit
    def cksum(key, x):
        s = x.sum()
        return jax.random.fold_in(
            key, jnp.where(jnp.isfinite(s), 1, 0).astype(jnp.int32))

    @jax.jit
    def poisson(key, rate):
        incs = rand.poisson(jax.random.fold_in(key, 0), rate,
                            shape=(nreads, na, na))
        return cksum(key, incs[:, ::997, ::997].sum())

    @functools.partial(jax.jit, static_argnames=("mode",))
    def acc(key, rate, T_d, mode):
        incs = rand.poisson(jax.random.fold_in(key, 0), rate,
                            shape=(nreads, na, na))
        if mode == "pallas":
            res = contract_pallas.contract_reads(T_d, incs)
        else:
            res = jnp.einsum("jr,ryx->jyx", T_d, incs,
                             preferred_element_type=jnp.float32)
        return cksum(key, res)

    # the 'P' layer's per-pixel form: a synthetic endslice map selects
    # ONE contraction row per pixel, folded into the accumulation
    T_np = np.asarray(T, np.float32)

    @jax.jit
    def acc_fused(key, rate, esmap):
        incs = rand.poisson(jax.random.fold_in(key, 0), rate,
                            shape=(nreads, na, na))
        masks = [esmap == j for j in range(ngrp)]
        out = jnp.zeros((na, na), jnp.float32)
        for r in range(nreads):
            w_r = jnp.zeros((na, na), jnp.float32)
            for j, mk in enumerate(masks):
                w_r = w_r + jnp.where(mk, float(T_np[j, r]), 0.0)
            out = out + w_r * incs[r]
        return cksum(key, out)

    esmap = jax.device_put(
        (jnp.arange(na)[:, None] + jnp.arange(na)[None]) % ngrp)
    stages = {
        "poisson": functools.partial(poisson, rate=rate),
        "acc_dot": functools.partial(acc, rate=rate, T_d=T_d, mode="dot"),
        "acc_pallas": functools.partial(acc, rate=rate, T_d=T_d,
                                        mode="pallas"),
        "acc_fused": functools.partial(acc_fused, rate=rate, esmap=esmap),
    }
    out = {}
    for name, fn in stages.items():
        try:
            dt = timed(fn)
            out[name] = round(dt * 1e3, 2)
            print(f"{name:12s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            out[name + "_error"] = repr(e)
            print(f"{name:12s} FAILED: {e!r}", flush=True)
    import json

    print(json.dumps({"nside": nside, "stages_ms": out}), flush=True)


if __name__ == "__main__":
    main()
