"""In-memory synthetic inputs for benchmarks, entry points, and
multi-chip dry runs (no file I/O).

Builds the same detector model as :mod:`synth` but directly as arrays,
plus a plausible L1 ramp cube, packaged as the array bundle the
L1->L2 core consumes.
"""

import os

import numpy as np

from .ops import ipc_pallas, ramp
from .pipeline import l1_to_l2

READ_PATTERN_DEFAULT = [[0], [1, 2], [3, 4, 5], [6, 7, 8, 9, 10], [11, 12], [13]]

#: Bumped whenever the SYNTHESIZED ARRAYS change (not the plan/cfg —
#: those are rebuilt on every call).  A stale disk-cached bundle would
#: silently bench a different workload than the code synthesizes.
#: rev 2: + ipc_kernel_frame (border-zeroed full-frame planes for the
#: IPC_BACKEND 'pallas-frame' default).
_BUNDLE_REV = 2

#: Below this, synthesis is sub-second and disk caching is pure
#: overhead (tests run many small bundles).  Module-level so the cache
#: machinery itself can be unit-tested at toy sizes.
_BUNDLE_CACHE_MIN_NSIDE = 2048


def _bundle_cache_path(nside, read_pattern, seed, frame_time, nborder):
    """Disk-cache path for the ``core_bundle`` array dict, or None.

    Building the 4096^2 bundle is ~80 s of host numpy on an idle VM and
    316 s was measured inside bench.py's budgeted Pallas subprocess
    (host contention + the jitted ``ipc_precal`` riding the TPU relay)
    — which single-handedly blew the 600 s warm-attempt budget on
    Aug 19.  A ~3.3 GB uncompressed npz loads back in ~23 s,
    bit-exactly (verified), so every bench/profiler process after the
    first gets the bundle for the price of a disk read.
    """
    if os.environ.get("ROMAN_BENCH_BUNDLE_CACHE", "1") == "0":
        return None
    if nside < _BUNDLE_CACHE_MIN_NSIDE:
        return None  # small test bundles build in <1 s; not worth disk
    import hashlib
    import json

    key = json.dumps([nside, [list(g) for g in read_pattern], seed,
                      frame_time, nborder, _BUNDLE_REV])
    h = hashlib.sha1(key.encode()).hexdigest()[:12]
    d = os.environ.get("ROMAN_BUNDLE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "romanimpreprocess_tpu",
        "bundles")
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    return os.path.join(d, f"core_{nside}_{h}.npz")


def _bundle_cache_load(path):
    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception:  # corrupt/truncated cache: rebuild
        return None


def _bundle_cache_save(path, arr):
    if path is None:
        return
    # must end in .npz: np.savez silently APPENDS the suffix otherwise,
    # and os.replace then misses the real file (the save silently
    # no-opped and left 3.3 GB orphans until this suffix was added)
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:  # atomic: a killed bench subprocess must not leave a torn npz
        np.savez(tmp, **arr)
        os.replace(tmp, path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def synth_cal_arrays(nside, read_pattern, seed=1000, frame_time=3.04,
                     nborder=4, channelwidth=None):
    """Synthetic calibration arrays (host numpy), synth-generator model."""
    rng = np.random.RandomState(seed)
    N = nside
    nb = nborder
    N_ = N - 2 * nb
    cw = channelwidth or max(N // 32, 4)
    ngrp = len(read_pattern)
    t = np.array([frame_time * np.mean(np.asarray(g)) for g in read_pattern])
    x, y = np.meshgrid(np.arange(N), np.arange(N))

    dark_slope = 0.005 * 10.0 ** rng.normal(0.0, 1.0, (N, N)).astype(np.float32)
    for sl in (np.s_[:nb, :], np.s_[-nb:, :], np.s_[:, :nb], np.s_[:, -nb:]):
        dark_slope[sl] = 0.0
    bias = (
        13000.0
        + 200 * np.cos(2 * np.pi * x / 256.0)
        + 100 * np.sin(2 * np.pi * y / 256.0) ** 3
    )
    dark_cube = np.clip(
        bias[None] + dark_slope[None] * t[:, None, None], 0, 65535
    ).astype(np.float32)
    gain = np.clip(1.5 + 0.03 * rng.normal(size=(N, N)), 1.4, 1.6).astype(
        np.float32
    )

    K = np.zeros((3, 3, N_, N_), dtype=np.float32)
    K[0, 1] = K[2, 1] = 0.015
    K[1, 0] = K[1, 2] = 0.013
    K[0, 0] = K[2, 2] = K[0, 2] = K[2, 0] = 0.002
    K[0, :, 0, :] = 0.0
    K[:, 0, :, 0] = 0.0
    K[-1, :, -1, :] = 0.0
    K[:, -1, :, -1] = 0.0
    K[1, 1] = 1.0 - K.sum(axis=(0, 1)) + K[1, 1]

    Smin = np.clip(5000 + 500 * np.cos((x + 3 * y) / 100.0), 0.5, 65534.5).astype(np.float32)
    Smax = np.clip(56000 + 10000 * rng.uniform(size=(N, N)), 0.5, 65534.5).astype(np.float32)
    Sref = (Smin + 300 + 100 * (x % 2)).astype(np.float32)
    coefs = np.zeros((4, N, N), dtype=np.float32)
    coefs[2] = 20 + 180 * rng.uniform(size=(N, N))
    z = 2 * (Sref - Smin) / (Smax - Smin) - 1
    coefs[1] = (Smax - Smin) / 2.0 - 3 * coefs[2] * z
    coefs[0] = -coefs[1] * z - coefs[2] * (1.5 * z**2 - 0.5)

    flat = (0.95 + 0.1 * (x / N - 1) - 0.2 * (y / N * (1 - y / N))).astype(np.float32)

    mask = np.zeros((N, N), dtype=np.uint32)
    for sl in (np.s_[:nb, :], np.s_[-nb:, :], np.s_[:, :nb], np.s_[:, -nb:]):
        mask[sl] |= 2**31

    return dict(
        ngrp=ngrp,
        dark_cube=dark_cube,
        dark_slope=dark_slope,
        gain=gain,
        read_sigma=(6.0 + 5.0 * rng.uniform(size=(N, N))).astype(np.float32),
        resetnoise=(25.0 + 5.0 * rng.uniform(size=(N, N))).astype(np.float32),
        ipc_kernel=K,
        lin_coefs=coefs,
        lin_smin=Smin,
        lin_smax=Smax,
        lin_sref=Sref,
        lin_dq=np.zeros((N, N), np.uint32),
        flat=flat,
        mask_dq=mask,
        saturation=np.clip(Smax - 50, 1.5, None).astype(np.float32),
        saturation_dq=np.zeros((N, N), np.uint32),
        amp33_med=np.full((N, cw), 29000.0, np.float32),
        channelwidth=cw,
        bias=bias.astype(np.float32),
        t=t,
    )


def synth_l1_cube(cal, read_pattern, seed=7, rate_dn_s=1.0):
    """Plausible L1 ramp: bias + rate*t + read noise, uint16."""
    rng = np.random.RandomState(seed)
    N = cal["gain"].shape[0]
    ngrp = len(read_pattern)
    rate = rate_dn_s * (0.5 + rng.uniform(size=(N, N)).astype(np.float32))
    data = (
        cal["bias"][None]
        + (cal["dark_slope"] + rate)[None] * cal["t"][:, None, None]
        + rng.normal(0, 6, (ngrp, N, N))
    )
    return np.clip(np.round(data), 0, 65535).astype(np.uint16)


def exposure_bundle(nside=4096, read_pattern=None, seed=1000,
                    frame_time=3.04, nborder=4, skyorder=2):
    """(arr, prep-like dict, CalPack) for the fused exposure noise core
    (``pipeline.noise_core.make_exposure_noise_core``)."""
    from .io.calfiles import CalPack

    read_pattern = read_pattern or READ_PATTERN_DEFAULT
    arr, plan, cfg, geom = core_bundle(
        nside, read_pattern, seed, frame_time, nborder, skyorder
    )
    cal = synth_cal_arrays(nside, read_pattern, seed, frame_time, nborder)
    cw = cal["channelwidth"]
    pack = CalPack(
        dark_cube=cal["dark_cube"], dark_slope=cal["dark_slope"],
        gain=cal["gain"], read_sigma=cal["read_sigma"],
        resetnoise=cal["resetnoise"], u_pink=0.4, c_pink=0.8,
        amp33_valid=True, amp33_med=cal["amp33_med"],
        amp33_std=np.full((nside, cw), 5.0, np.float32),
        amp33_m_pink=0.8, amp33_ru_pink=1.0,
        ipc_kernel=cal["ipc_kernel"], lin_coefs=cal["lin_coefs"],
        lin_smin=cal["lin_smin"], lin_smax=cal["lin_smax"],
        lin_sref=cal["lin_sref"], lin_dq=cal["lin_dq"],
        flat=cal["flat"], mask_dq=cal["mask_dq"],
        saturation=cal["saturation"], saturation_dq=cal["saturation_dq"],
    )
    meta = ramp.ma_table_meta(read_pattern, frame_time)
    # sim-side active slices + fill aux for the full-exposure core
    nb = nborder
    act = np.s_[nb : nside - nb, nb : nside - nb]
    na = nside - 2 * nb
    arr = dict(
        arr,
        rate=np.full((na, na), 3.0, np.float32),
        gain_act=cal["gain"][act],
        resetnoise_act=cal["resetnoise"][act],
        read_sigma_act=cal["read_sigma"][act],
        dark_slope_act=cal["dark_slope"][act],
        biascorr_t0=np.float32(0.0),
        fill_resetnoise=cal["resetnoise"],
        fill_amp33_std=np.full((nside, cw), 5.0, np.float32),
        fill_c_pink=np.float32(0.8),
        fill_u_pink=np.float32(0.4),
        fill_m_pink=np.float32(0.8),
        fill_ru_pink=np.float32(1.0),
    )
    prep = dict(
        arr=arr, plan=plan, cfg=cfg, geom=geom,
        read_pattern=[list(g) for g in read_pattern],
        frame_time=frame_time, meta=meta, weights_out=plan.W[-1],
    )
    return arr, prep, pack


def core_bundle(nside=4096, read_pattern=None, seed=1000, frame_time=3.04,
                nborder=4, skyorder=2, likelihood=False):
    """(arr dict, plan, cfg, geom) ready for ``l1_to_l2.make_core``.

    ``likelihood=True`` swaps in the adaptive GLS fitter's plan (the
    reference's config-selectable ``romancal_ramp_fit`` production
    path, ``gen_cal_image.py:415-445``).
    """
    read_pattern = read_pattern or READ_PATTERN_DEFAULT
    ngrp = len(read_pattern)
    cw = max(nside // 32, 4)  # synth_cal_arrays' default channelwidth
    meta = ramp.ma_table_meta(read_pattern, frame_time)
    if likelihood:
        from .ops import likely
        plan = likely.build_likely_plan(meta, exclude_first=True)
    else:
        u_ = 0.4 / 1.8 / 6.5**2
        plan = ramp.build_plan(meta, u_, True, None)
    cfg = dict(
        exclude_first=True,
        backup=1,
        use_amp33=True,
        likelihood_fit=bool(likelihood),
        has_biascorr=False,
        has_dark_decay=False,
        wfi18=False,
        first_is_reset=(read_pattern[0] == [0]),
        has_ipc=True,
        ipc_pallas=False,
        has_dark_dq=False,
        skyorder=skyorder,
    )
    nb = nborder
    cache_path = _bundle_cache_path(nside, read_pattern, seed, frame_time,
                                    nborder)
    arr = _bundle_cache_load(cache_path)
    if arr is None:
        cal = synth_cal_arrays(nside, read_pattern, seed, frame_time,
                               nborder)
        data = synth_l1_cube(cal, read_pattern, seed + 1)
        arr = {
            "opt_slope": np.float32(0.5),
            "data": data,
            "amp33": np.full((ngrp, nside, cw), 29000.0, np.float32),
            "amp33_med": cal["amp33_med"],
            "dark_cube": cal["dark_cube"],
            "dark_slope": cal["dark_slope"],
            "dark_dq": np.zeros((nside, nside), np.uint32),
            "gain": cal["gain"],
            "read_sigma": cal["read_sigma"],
            "mask_dq": cal["mask_dq"],
            "saturation": cal["saturation"],
            "saturation_dq": cal["saturation_dq"],
            "biascorr": np.zeros((ngrp, nside - 2 * nb, nside - 2 * nb),
                                 np.float32),
            "lin_coefs": cal["lin_coefs"],
            "lin_smin": cal["lin_smin"],
            "lin_smax": cal["lin_smax"],
            "lin_sref": cal["lin_sref"],
            "lin_dq": cal["lin_dq"],
            "ipc_kernel": cal["ipc_kernel"],
            "flat": cal["flat"],
            "area_factor": np.ones((nside, nside), np.float32),
            "dark_decay_signal": np.zeros(ngrp, np.float32),
        }
        arr["dark_slope_ipc"], arr["flat_ipc"] = l1_to_l2.ipc_precal(
            cal["flat"], cal["dark_slope"], cal["gain"], cal["ipc_kernel"],
            nborder,
        )
        # pre-padded kernel slab for callers that flip ipc_pallas=True
        # (bench.py, profile tools); unread on the XLA path
        arr["ipc_kernel_padded"] = ipc_pallas.kernel_planes_padded(
            cal["ipc_kernel"], th=32
        )
        # border-zeroed full-frame planes for the 'pallas-frame'
        # default (callers drop whichever kernel forms they don't use
        # before device_put)
        arr["ipc_kernel_frame"] = ipc_pallas.kernel_planes_frame(
            cal["ipc_kernel"], nside, nb
        )
        _bundle_cache_save(cache_path, arr)
    return arr, plan, cfg, (nside, nborder, cw)


def consume_all(out):
    """Full-frame f32 checksum over EVERY leaf of a timed program's
    output.

    Timing chains must fold this (not a single-pixel read) into the
    chain key: consuming ``out["slope"][0, 0]`` inside the same jit
    lets XLA dead-code-eliminate the error/variance maps, the DQ
    reduction, and the sky diagnostics — the chain then times a
    smaller program than the one it claims to (the Aug-19 honest-chain
    correction, docs/performance.md).
    """
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(v.astype(jnp.float32))
               for v in jax.tree_util.tree_leaves(out))


def key_advance(key, cks):
    """``advance`` for :func:`scan_chain` when the chain carry is a
    PRNG key: folds the (zeroed) checksum in so the next iteration is
    data-dependent on the previous one's complete output."""
    import jax
    import jax.numpy as jnp

    return jax.random.fold_in(key, (cks * 0).astype(jnp.int32) + 1)


def scan_chain(fn, args, carry0, n_lo=1, n_hi=5, repeats=1, advance=None):
    """Chain-differenced seconds/iteration of ``fn(carry, args)``.

    The shared jitted-scan timing harness (bench.py's sim chain,
    tools/profile_sim.py, tools/profile_stages.py).  ``fn`` must return
    its COMPLETE output pytree; the harness — not the call site — folds
    a full-frame checksum over every leaf (:func:`consume_all`) into
    the chain carry, so no timed program can be dead-code-eliminated
    below the outputs ``fn`` claims to produce.  This makes the Aug-19
    honest-chain rule structural: a call site physically cannot consume
    less than everything (returning a sliced pixel times a sliced
    program — the bug class that inflated the pre-correction headline
    2x, docs/performance.md).

    ``args`` is passed as a jit ARGUMENT (closing over full-frame
    arrays blows the axon remote-compile payload limit).  ``advance``
    maps ``(carry, cks) -> carry'`` and must be data-dependent on
    ``cks``; the default adds the zeroed checksum into an array carry,
    :func:`key_advance` handles PRNG-key carries.  Each timing sample
    differences an ``n_hi``- against an ``n_lo``-length chain
    (dispatch/fetch overhead cancels; ``block_until_ready`` does not
    synchronize on the axon relay).  Returns the list of ``repeats``
    per-iteration samples in seconds.
    """
    import functools
    import time

    import jax

    if advance is None:
        def advance(c, cks):
            return c + (cks * 0).astype(c.dtype)

    @functools.partial(jax.jit, static_argnums=2)
    def chained(carry, a, n):
        def body(c, _):
            cks = consume_all(fn(c, a))
            return advance(c, cks), cks

        _, ss = jax.lax.scan(body, carry, None, length=n)
        return ss

    jax.device_get(chained(carry0, args, n_lo))  # compile both lengths
    jax.device_get(chained(carry0, args, n_hi))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(carry0, args, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(chained(carry0, args, n_hi))
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (n_hi - n_lo))
    return samples


def timed_chain(step, n_lo=1, n_hi=3, repeats=2, seed=5, reduce=min):
    """Chain-differenced wall clock of ``step: key -> key`` seconds.

    On the axon relay backend ``block_until_ready`` does not
    synchronize remote execution, so each measurement times a
    serially-dependent chain of ``step`` dispatches (each step's key is
    data-dependent on the previous step's product) and differences two
    chain lengths — the dispatch/fetch overhead cancels exactly.
    Shared by the profiling tools (``tools/profile_staged.py`` etc.);
    ``reduce`` collapses the ``repeats`` samples (``min`` for stage
    attribution, ``np.median`` for reported numbers).
    """
    import time

    import jax

    from .ops import rand

    def chain(n):
        key = rand.sim_key(seed)
        for _ in range(n):
            key = step(key)
        return jax.device_get(jax.random.key_data(key))

    chain(n_lo)  # compile/warm both chain lengths
    chain(n_hi)
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        chain(n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(n_hi)
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (n_hi - n_lo))
    return float(reduce(samples))
