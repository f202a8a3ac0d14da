"""Sub-stage attribution for the refdata/1-f fill core.

The staged-exposure profile (``tools/profile_staged.py``) shows fill as
the largest single stage (~87 ms at 4096^2, and it runs twice per
exposure: once for the base L1 and once inside each 'R' noise layer).
This tool times its internals with the chained-key harness:

  white      hardware-RBG normal draw for the pink spectra alone
  fft        amp-shaped spectrum -> two-stage MXU Cooley-Tukey FFT
  pink       full pink_frames (white + shape + fft + mean-subtract)
  noband     fill core with banding disabled (strips + concat + clip)
  fill       the full fill core as dispatched in production

Usage: python tools/profile_fill.py [nside]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.ops import pink
from romanimpreprocess_tpu.pipeline import sim_to_l1

NVEC = tuple(len(g) for g in benchlib.READ_PATTERN_DEFAULT)


def cksum(key, x):
    # full checksum: a [0, 0]-only read would let XLA dead-code-
    # eliminate everything not feeding that pixel inside a fused chain
    return jax.random.fold_in(
        key,
        jnp.where(jnp.isfinite(benchlib.consume_all(x)),
                  1, 0).astype(jnp.int32),
    )


def build(nside):
    cw = max(nside // 32, 4)
    nch = nside // cw
    ngrp = len(NVEC)
    nframes = ngrp * (1 + nch + 1)
    length = 2 * nside * cw
    ntr = (nframes + 1) // 2

    arr, prep, pack = benchlib.exposure_bundle(nside=nside)
    from romanimpreprocess_tpu.pipeline import noise_core

    fill_arrs = dict(
        noise_core.fill_call_arrs(arr),
        im=np.zeros((ngrp, nside - 8, nside - 8), np.float32),
    )
    fill_arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in
                 fill_arrs.items()}

    @jax.jit
    def white(key):
        w = jax.random.normal(key, (ntr, 2, length), dtype=jnp.bfloat16)
        return cksum(key, w)

    n1 = 1 << ((length.bit_length() - 1) // 2)
    n2 = length // n1

    @jax.jit
    def spec(key):
        # white draw + amplitude shaping only (no transform)
        w = jax.random.normal(key, (ntr, 2, length), dtype=jnp.bfloat16)
        k_idx = jnp.arange(length, dtype=jnp.float32)
        k_fold = jnp.minimum(k_idx, length - k_idx)
        amp = ((1.0e-99 + k_fold) ** (-0.5)).astype(jnp.bfloat16)
        return cksum(key, w[:, 0] * amp + w[:, 1] * amp)

    @jax.jit
    def fft(key):
        # production-matched transform: RNG spectrum, half output
        w = jax.random.normal(key, (ntr, 2, length), dtype=jnp.bfloat16)
        k_idx = jnp.arange(length, dtype=jnp.float32)
        k_fold = jnp.minimum(k_idx, length - k_idx)
        amp = ((1.0e-99 + k_fold) ** (-0.5)).astype(jnp.bfloat16)
        xr, xi = pink._fft_ct(w[:, 0] * amp, w[:, 1] * amp, n1, n2,
                              both=True, half=True)
        return cksum(key, xr + xi)

    @jax.jit
    def pinkf(key):
        fr = pink.pink_frames(key, nframes, nside, cw)
        return cksum(key, fr)

    @jax.jit
    def pinkp(key):
        fr = pink.pink_frames(key, nframes, nside, cw, pallas=True)
        return cksum(key, fr)

    def fillfn(banding, pink_pallas=False):
        core = sim_to_l1._fill_core_factory(
            NVEC, nside, cw, 4, banding, True, im_is_active=True,
            pink_pallas=pink_pallas,
        )

        # arrs passed as an ARGUMENT (closing device arrays over the
        # jit embeds them as constants -> remote-compile HTTP 413)
        @jax.jit
        def fn(key, arrs):
            im_u16, _a33 = core(key, arrs)
            return cksum(key, im_u16)

        return functools.partial(fn, arrs=fill_arrs)

    return {
        "white": white,
        "spec": spec,
        "fft": fft,
        "pink": pinkf,
        "pink_pallas": pinkp,
        "noband": fillfn(False),
        "fill": fillfn(True),
        "fill_pallas": fillfn(True, pink_pallas=True),
    }


def timed(fn, n_lo=1, n_hi=4):
    return benchlib.timed_chain(fn, n_lo=n_lo, n_hi=n_hi, repeats=3,
                                seed=11, reduce=min)


def main():
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    fns = build(nside)
    for name, fn in fns.items():
        if only and name not in only:
            continue
        dt = timed(fn)
        print(f"{name:8s} {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
