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

from romanimpreprocess_tpu import benchlib
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
        return benchlib.consume_all(d)

    def st_p(k, a):
        e_exp = jnp.clip(a["withsky"] * a["gain"] * ft, 0.0, None)
        d = resample_traced(k, e_exp, a["gain"], a["es"], rp, wv, ngrp)
        return benchlib.consume_all(d)

    def st_zclip(k, a):
        x = a["diff"] + jax.random.uniform(k, (1, 1))
        q25, med, q75 = jnp.percentile(x, jnp.asarray([25.0, 50.0, 75.0]))
        return (q75 - q25) + med

    def st_medfit(k, a):
        x = a["diff"] + jax.random.uniform(k, (1, 1))
        _, model = sky.medfit(x, order=2)
        return benchlib.consume_all(model)

    for name, f in [("o_layer(type1)", st_o), ("p_resample", st_p),
                    ("zclip_percentile", st_zclip), ("medfit", st_medfit)]:
        dt = timed(f, key, args)
        out[name] = round(dt * 1e3, 2)
        print(f"{name:18s} {dt * 1e3:8.2f} ms", flush=True)
    import json
    print(json.dumps({"nside": nside, "stages_ms": out}))


def main_cube():
    """``python tools/profile_exposure.py cube [nside]`` — wall-clock of
    the config-driven noise path (``noise.make_noise_cube``, now
    device-resident by default) vs direct staged-runner dispatch on the
    same exposure.  The config path adds host prep + H2D staging per
    call; the acceptance bar is staying within ~1.2x of the runner.
    """
    import json

    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import noise, noise_core

    nside = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    layers = ["Rz4S2", "O", "PbrS2"]
    arr, prep, pack = benchlib.exposure_bundle(nside=nside)

    # a base L1 tree + minimal config for the config-driven path
    l1 = {
        "data": np.asarray(prep["arr"]["data"], np.uint16),
        "amp33": np.full(
            (len(prep["read_pattern"]), nside, prep["geom"][2]), 29000,
            np.uint16,
        ),
        "meta": {
            "exposure": {
                "read_pattern": prep["read_pattern"],
                "frame_time": prep["frame_time"],
            },
            "instrument": {"detector": "WFI04"},
        },
    }
    base_l2 = {"processinfo": {"endslice": np.zeros((2, 2), np.int8)}}
    config = {
        # membership-only caldir flags: match the benchlib cfg so the
        # config path reuses the SAME compiled core as the runner
        "CALDIR": {"ipc4d": "synthetic"}, "SKYORDER": 2,
        "NOISE": {"LAYER": layers, "SEED": 7, "BACKEND": "device-strict"},
    }

    def run_cfg():
        return noise.make_noise_cube(
            config, pack=pack, base_l1=l1, base_l2=base_l2
        )

    run = noise_core.make_staged_noise_runner(prep, pack, layers, config)
    arrs = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in {
            **prep["arr"],
            **noise_core.fill_aux_arrays(pack, prep["geom"]),
        }.items()
    }

    def run_staged():
        cube, _b, cs = run(rand.sim_key(7), arrs)
        float(cs)
        return cube

    out = {}
    for name, f in (("config_path", run_cfg), ("staged_runner", run_staged)):
        f()  # compile / cache
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        out[name + "_ms"] = round(float(np.median(ts)) * 1e3, 1)
        print(f"{name:14s} {out[name + '_ms']:9.1f} ms", flush=True)
    out["ratio"] = round(out["config_path_ms"] / out["staged_runner_ms"], 3)
    print(json.dumps({"nside": nside, **out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cube":
        main_cube()
    else:
        main()
