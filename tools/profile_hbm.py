"""HBM-pressure experiment for the base-calibration anomaly.

The staged exposure runner measures the base calibration at ~54 ms
while the identical core measures ~38 ms standalone (bench.py).  The
working hypothesis is HBM pressure: the exposure keeps ~2-3 GB of
staging resident (dark cube, lin coefficient stack, padded IPC slab,
rate/fill aux) that the standalone bench does not.

This tool times the bare calibration core (chained-key harness) while
holding parametrized amounts of untouched device ballast resident:

    python tools/profile_hbm.py [nside] [ballast_gb,...]

Default ballast sweep 0,1,2,3 GB.  If wall-clock grows with ballast the
pressure theory is confirmed (allocator fragmentation / page pressure
on the relay worker); if flat, the anomaly is in the dispatch pattern
instead (e.g. stage interleaving), and the fix hunt moves there.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.pipeline import l1_to_l2


def build_core(nside):
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside)
    pallas = jax.default_backend() == "tpu"
    cfg = dict(cfg, ipc_pallas=False, ipc_stream=False, ipc_frame=pallas,
               lin_pallas=pallas, med_pallas=pallas)
    for k in (("ipc_kernel", "ipc_kernel_padded") if pallas
              else ("ipc_kernel_frame", "ipc_kernel_padded")):
        arr.pop(k, None)
    core = l1_to_l2.make_core(plan, cfg, geom)
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}

    # key-chained step: fold a data-dependent scalar of the slope into
    # the key so iterations serialize (benchlib.timed_chain contract)
    @jax.jit
    def step(key, arrs):
        out = core(dict(arrs, data=arrs["data"]))
        cks = benchlib.consume_all(out)  # no partial-output DCE
        return jax.random.fold_in(
            key,
            jnp.where(jnp.isfinite(cks), 1, 0).astype(jnp.int32),
        )

    return functools.partial(step, arrs=arrs)


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    gbs = (
        [float(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [0.0, 1.0, 2.0, 3.0]
    )
    step = build_core(nside)
    ballast = None
    for gb in gbs:
        del ballast  # free the previous sweep point first
        ballast = None
        if gb > 0:
            n = int(gb * (1 << 30) / 4)
            # touched once at allocation, then held resident untouched
            ballast = jax.device_put(jnp.ones((n,), jnp.float32))
            ballast.block_until_ready()
        dt = benchlib.timed_chain(step, n_lo=1, n_hi=5, repeats=3,
                                  seed=13, reduce=np.median)
        print(f"ballast {gb:4.1f} GB   core {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
