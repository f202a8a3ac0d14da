"""Full-scale 18-SCA focal-plane demo on the virtual 8-device CPU mesh.

Demonstrates the production FPA sweep (the reference's Slurm array over
18 SCAs, ``runs/summer2025run/OpenUniverse_to_L1L2.py:107-169``) as one
``parallel.calibrate_fpa`` call: 18 synthetic L1 exposures staged by
the host thread pool, stacked, sharded over an 8-device mesh, pushed
through one batched jitted core, unpacked and written — with per-phase
wall clocks (host staging vs sharded compute vs write) and per-SCA
parity asserted against the single-SCA ``calibrateimage`` path.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/fpa_demo.py [nside] [n_sca]   # defaults 1024, 18

Runs on CPU by design (forced below): this validates the multi-SCA
memory plan, grouping, and staging overlap without TPU hardware.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_l1_files(d, n_sca, nside, read_pattern, caldir):
    """Write n_sca synthetic L1 ASDF exposures consistent with the
    shared caldir (dark ramp + per-SCA rate + read noise, uint16)."""
    from romanimpreprocess_tpu.io import asdf_lite, calfiles
    from romanimpreprocess_tpu.ops import ramp

    pack = calfiles.load_caldir(caldir)
    ngrp = len(read_pattern)
    de = pack.dark_cube.shape[0] - ngrp
    meta = ramp.ma_table_meta(read_pattern, 3.04)
    tbar = np.asarray(meta["tbar"], np.float64)
    cw = pack.amp33_med.shape[1] if pack.amp33_med is not None else 128
    paths = []
    for sca in range(1, n_sca + 1):
        rng = np.random.RandomState(1000 + sca)
        rate = 2.0 + rng.uniform(0.0, 2.0, (nside, nside))
        data = (
            pack.dark_cube[de:]
            + rate[None] * tbar[:, None, None]
            + rng.normal(0, 5.0, (ngrp, nside, nside))
        )
        tree = {
            "roman": {
                "meta": {
                    "exposure": {
                        "read_pattern": [list(g) for g in read_pattern],
                        "frame_time": 3.04,
                    },
                    "instrument": {"detector": f"WFI{sca:02d}"},
                },
                "data": np.clip(np.round(data), 0, 65535).astype(np.uint16),
                "amp33": np.full((ngrp, nside, cw), 29000, np.uint16),
            }
        }
        p = f"{d}/L1_{sca:02d}.asdf"
        asdf_lite.AsdfFile(tree).write_to(p)
        paths.append(p)
    return paths


def main():
    import tempfile

    from romanimpreprocess_tpu import parallel
    from romanimpreprocess_tpu.io import asdf_lite
    from romanimpreprocess_tpu.pipeline import l1_to_l2
    from romanimpreprocess_tpu.synth import make_cal_files

    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_sca = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    rp = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
    d = tempfile.mkdtemp(prefix="fpa_demo_")
    print(f"workdir {d}; {n_sca} SCAs at {nside}^2 on "
          f"{len(jax.devices())} devices", flush=True)

    t0 = time.perf_counter()
    caldir = make_cal_files(d + "/cal", rp, nside=nside, seed=3)
    l1s = make_l1_files(d, n_sca, nside, rp, caldir)
    t_synth = time.perf_counter() - t0
    print(f"synthesized cal + {n_sca} L1 files in {t_synth:.1f} s",
          flush=True)

    configs = [
        {"IN": p, "OUT": p.replace("L1_", "L2_"), "CALDIR": caldir,
         "SKYORDER": 2, "SLICEOUT": True}
        for p in l1s
    ]
    mesh = parallel.sca_mesh()
    trees, timings = parallel.calibrate_fpa(configs, mesh=mesh, profile=True)
    print("timings: " + json.dumps(
        {k: (round(v, 2) if isinstance(v, float) else v)
         for k, v in timings.items()}), flush=True)

    # per-SCA parity vs the single-SCA path on a sample of SCAs
    worst = 0.0
    for i in (0, n_sca // 2, n_sca - 1):
        single = dict(configs[i], OUT=d + "/single.asdf")
        l1_to_l2.calibrateimage(single)
        ref = asdf_lite.open(d + "/single.asdf")["roman"]
        got = trees[i]["roman"]
        assert np.array_equal(np.asarray(got["dq"]), np.asarray(ref["dq"])), i
        dd = np.abs(np.asarray(got["data"]) - np.asarray(ref["data"]))
        worst = max(worst, float(dd.mean()))
        assert dd.mean() < 5e-3 and np.percentile(dd, 99.9) < 0.05, (
            i, dd.mean())
    print(f"per-SCA parity OK (mean |diff| <= {worst:.2e})", flush=True)

    compute = sum(g["compute_s"] for g in timings["groups"])
    print(json.dumps({
        "nside": nside, "n_sca": n_sca, "n_devices": len(jax.devices()),
        "host_staging_s": round(timings["host_staging_s"], 2),
        "sharded_compute_s": round(compute, 2),
        "write_s": round(timings.get("write_s", 0.0), 2),
        "total_s": round(timings["total_s"], 2),
        "parity": "ok",
    }), flush=True)

    # ---- full production exposure (sim -> L1 -> L2 -> noise) on the
    # mesh: every staged stage one sharded dispatch across the batch
    # (reference per-SCA Slurm workload, OpenUniverse_to_L1L2.py) ----
    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import noise_core  # noqa: F401

    ndev = len(jax.devices())
    nexp = min(nside, 256)  # exposure-runner demo geometry
    arr, prep, pack = benchlib.exposure_bundle(nside=nexp)
    batch = parallel.broadcast_batch(arr, ndev)
    # heterogeneous detectors: per-SCA pink-noise amplitudes (every
    # SCA's 'read' cal file differs in production) ride as runtime
    # data, so the mixed batch stays ONE machinery group / one compile
    batch["fill_c_pink"] = np.linspace(0.6, 1.0, ndev).astype(np.float32)
    batch["fill_u_pink"] = np.linspace(0.3, 0.5, ndev).astype(np.float32)
    run = parallel.make_fpa_exposure_runner(
        prep, pack, ["Rz4S2", "O", "PbrS2"], mesh
    )
    t0 = time.perf_counter()
    cube, base, cks = run(
        jax.random.key(17, impl="rbg"), parallel.shard_batch(mesh, batch)
    )
    cks = np.asarray(cks)  # fetch synchronizes the whole batch
    t_exp = time.perf_counter() - t0
    assert np.isfinite(cks).all()

    # REAL lane-0 parity (not just finiteness): the batched-RNG
    # contract pins lane 0 to a single-SCA staged run keyed with
    # split(key, n)[0] (docs/parallel.md), modulo vmap reduction-order
    # drift — run it and compare before reporting parity
    import jax.numpy as jnp

    run1 = noise_core.make_staged_exposure_runner(
        prep, pack, ["Rz4S2", "O", "PbrS2"]
    )
    arr1 = dict(
        arr,
        fill_c_pink=np.float32(batch["fill_c_pink"][0]),
        fill_u_pink=np.float32(batch["fill_u_pink"][0]),
    )
    k0 = jax.random.split(jax.random.key(17, impl="rbg"), ndev)[0]
    cube1, _base1, cks1 = run1(
        k0, {k: jax.device_put(jnp.asarray(v)) for k, v in arr1.items()}
    )
    dd = np.abs(np.asarray(cube)[0] - np.asarray(cube1))
    assert dd.mean() < 5e-3 and dd.max() < 1.0, (
        f"lane-0 exposure parity failed: mean {dd.mean()}, max {dd.max()}"
    )
    print(json.dumps({
        "exposure_demo": {"nside": nexp, "n_sca": ndev,
                          "layers": ["Rz4S2", "O", "PbrS2"],
                          "wall_s": round(t_exp, 2), "parity": "ok",
                          "lane0_drift_mean": float(dd.mean()),
                          "lane0_drift_max": float(dd.max())},
    }), flush=True)


if __name__ == "__main__":
    main()
