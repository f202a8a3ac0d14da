"""Full-frame mesh-program validation/timing on the REAL chip.

The multi-chip legs of ``__graft_entry__.dryrun_multichip`` run at
nside=64 on a virtual CPU mesh — they prove the shardings compile and
execute, not that the full-frame programs fit and perform.  This tool
runs the SAME mesh programs at production size (4096^2) on however many
real devices exist (a 1-device mesh on the axon relay), so the 8-chip
projections rest on a full-frame compile + HBM-residency + wall-clock
measurement rather than on tiny-shape dryruns.

Legs:
  sca      ("sca",) mesh, ``parallel.make_fpa_calibrator`` with
           ``n_sca`` lanes (vmapped batched core, lanes sharded over
           the mesh — on 1 device: both lanes resident on one chip,
           validating the 2-SCA-per-chip memory plan of an 18-on-8
           sweep, where 2 chips carry 3 SCAs).
  row      ("row",) mesh, row-sharded single-SCA core
           (``parallel.spatial``) — with 1 device this compiles the
           GSPMD-annotated program at full frame.
  sca_row  ("sca","row") 2-D mesh (1x1 on a single device).

Usage: python tools/profile_mesh.py [nside] [n_sca]   # default 4096 2

Prints one JSON line per leg.  Reference analog: none (the reference
parallelizes via Slurm array jobs only, OpenUniverse_to_L1L2.job).
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

from romanimpreprocess_tpu import benchlib, parallel
from romanimpreprocess_tpu.parallel import spatial
from romanimpreprocess_tpu.pipeline import l1_to_l2


def time_core(run, batch, n_lo=1, n_hi=5, repeats=3):
    """Chain-differenced wall clock of run(batch) (bench.py harness:
    block_until_ready does not synchronize on the axon relay)."""

    @functools.partial(jax.jit, static_argnums=1)
    def chained(arrs, n):
        def body(carry, _):
            out = run(dict(arrs, data=carry))
            # consume EVERY output at full frame — a slope-only read
            # lets XLA dead-code-eliminate the err/var/dq maps and the
            # sky diagnostics, silently timing a smaller program (the
            # honest-chain correction, docs/performance.md)
            cks = sum(jnp.sum(v.astype(jnp.float32))
                      for v in jax.tree_util.tree_leaves(out))
            bump = (cks * 0).astype(carry.dtype)
            return carry + bump, cks

        _, ss = jax.lax.scan(body, arrs["data"], None, length=n)
        return ss

    jax.device_get(chained(batch, n_lo))
    jax.device_get(chained(batch, n_hi))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(batch, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(chained(batch, n_hi))
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (n_hi - n_lo))
    return samples


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_sca = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    # ROMAN_MESH_PALLAS=0 keeps the mesh programs XLA-only: the honest
    # chains are new program shapes, and a cold VMAPPED Pallas compile
    # on the remote-compile relay costs tens of minutes per leg
    pallas = (jax.default_backend() == "tpu"
              and os.environ.get("ROMAN_MESH_PALLAS", "1") != "0")
    cfg = dict(cfg, ipc_pallas=False, ipc_stream=False, ipc_frame=pallas,
               lin_pallas=pallas, med_pallas=pallas)
    for k in (("ipc_kernel", "ipc_kernel_padded") if pallas
              else ("ipc_kernel_frame", "ipc_kernel_padded")):
        arr.pop(k, None)  # stage only the kernel form this backend reads

    ndev = len(jax.devices())

    # --- leg 1: ("sca",) batch of n_sca lanes ---
    mesh = parallel.sca_mesh(n_devices=min(ndev, n_sca))
    batch = parallel.broadcast_batch(arr, n_sca)
    batch = parallel.shard_batch(mesh, batch)
    run = parallel.make_fpa_calibrator(plan, cfg, geom, mesh)
    s = time_core(run, batch)
    del batch
    print(json.dumps({
        "leg": "sca", "nside": nside, "n_sca": n_sca, "n_dev": ndev,
        "ms_per_batch": round(float(np.median(s)) * 1e3, 3),
        "ms_per_sca": round(float(np.median(s)) * 1e3 / n_sca, 3),
        "samples_ms": [round(x * 1e3, 3) for x in s],
    }), flush=True)

    # --- leg 2: ("row",) row-sharded single SCA ---
    mesh_r = spatial.row_mesh()
    arrs_r = spatial.shard_rows(mesh_r, arr, geom)
    core = spatial.make_spatial_calibrator(plan, cfg, geom, mesh_r)
    s = time_core(core, arrs_r)
    del arrs_r
    print(json.dumps({
        "leg": "row", "nside": nside, "n_dev": ndev,
        "ms_per_sca": round(float(np.median(s)) * 1e3, 3),
        "samples_ms": [round(x * 1e3, 3) for x in s],
    }), flush=True)

    # --- leg 3: ("sca","row") 2-D mesh ---
    n_sca_m = min(n_sca, ndev)
    n_row = max(1, ndev // n_sca_m)
    mesh2 = spatial.sca_row_mesh(n_sca_m, n_row)
    batch2 = parallel.broadcast_batch(arr, n_sca)
    batch2 = spatial.shard_batch_rows(mesh2, batch2, geom)
    run2 = parallel.make_fpa_calibrator(plan, cfg, geom, mesh2)
    s = time_core(run2, batch2)
    print(json.dumps({
        "leg": "sca_row", "nside": nside, "n_sca": n_sca,
        "mesh_shape": [n_sca_m, n_row], "n_dev": ndev,
        "ms_per_batch": round(float(np.median(s)) * 1e3, 3),
        "ms_per_sca": round(float(np.median(s)) * 1e3 / n_sca, 3),
        "samples_ms": [round(x * 1e3, 3) for x in s],
    }), flush=True)


if __name__ == "__main__":
    main()
