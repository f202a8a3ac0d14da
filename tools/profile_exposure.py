"""Stage timings for the staged exposure runner's noise stages on TPU.

Times o_layer (device Pearson), p_layer (per-raw-read resample),
zclip (exact percentiles), and medfit at full frame with the chained
differencing harness.  Usage: python tools/profile_exposure.py [nside]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu.galpoisson.pearson_jax import draw_from_pearson_jax
from romanimpreprocess_tpu.ops import rand, sky
from romanimpreprocess_tpu.pipeline.noise import resample_traced, weightvec_table
from romanimpreprocess_tpu.ops import ramp


def timed(fn, key, args, n_lo=1, n_hi=5):
    @functools.partial(jax.jit, static_argnums=2)
    def chained(key, args, n):
        def body(carry, _):
            k = jax.random.fold_in(carry, 0)
            s = fn(k, args)
            k = jax.random.fold_in(k, (s * 0).astype(jnp.int32) + 1)
            return k, s
        _, ss = jax.lax.scan(body, key, None, length=n)
        return ss

    jax.device_get(chained(key, args, n_lo))
    jax.device_get(chained(key, args, n_hi))
    t0 = time.perf_counter()
    jax.device_get(chained(key, args, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(chained(key, args, n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    na = nside - 8
    rp = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]
    ngrp = len(rp)
    ft = 3.04
    meta = ramp.ma_table_meta(rp, ft)
    plan = ramp.build_plan(meta, 0.4 / 1.8 / 6.5**2, True, None)
    wv, start = weightvec_table(meta["tbar"], plan.W[-1], ngrp, True)

    rng = np.random.RandomState(0)
    args = {
        "withsky": jnp.asarray(
            rng.uniform(0.5, 3.0, (na, na)).astype(np.float32)
        ),
        "gain": jnp.asarray(
            np.clip(1.5 + 0.03 * rng.normal(size=(na, na)), 1.4, 1.6
                    ).astype(np.float32)
        ),
        "es": jnp.full((na, na), ngrp - 1, jnp.int32),
        "diff": jnp.asarray(
            rng.normal(0, 1, (na, na)).astype(np.float32)
        ),
    }
    args = {k: jax.device_put(v) for k, v in args.items()}
    key = rand.sim_key(1)
    out = {}

    def st_o(k, a):
        gI = a["gain"] * a["withsky"]
        # realistic full-ramp weights -> dominant type-1 path
        d = draw_from_pearson_jax(k, 0.33, -0.21, 0.20, gI)
        return d[0, 0]

    def st_p(k, a):
        e_exp = jnp.clip(a["withsky"] * a["gain"] * ft, 0.0, None)
        d = resample_traced(k, e_exp, a["gain"], a["es"], rp, wv, ngrp)
        return d[0, 0]

    def st_zclip(k, a):
        x = a["diff"] + jax.random.uniform(k, (1, 1))
        q25, med, q75 = jnp.percentile(x, jnp.asarray([25.0, 50.0, 75.0]))
        return (q75 - q25) + med

    def st_medfit(k, a):
        x = a["diff"] + jax.random.uniform(k, (1, 1))
        _, model = sky.medfit(x, order=2)
        return model[0, 0]

    for name, f in [("o_layer(type1)", st_o), ("p_resample", st_p),
                    ("zclip_percentile", st_zclip), ("medfit", st_medfit)]:
        dt = timed(f, key, args)
        out[name] = round(dt * 1e3, 2)
        print(f"{name:18s} {dt * 1e3:8.2f} ms", flush=True)
    import json
    print(json.dumps({"nside": nside, "stages_ms": out}))


if __name__ == "__main__":
    main()
