"""Focal-plane batching over a device mesh.

The reference's only parallelism is Slurm array jobs, one process per
SCA (``runs/summer2025run/OpenUniverse_to_L1L2.job:4``; SURVEY.md §2.4).
Here the 18-SCA focal plane is a first-class batch axis: the L1->L2
calibration core is ``vmap``-ed over a leading "sca" axis and sharded
over a 1-D ``jax.sharding.Mesh`` — each chip of a v5e-8 slice processes
its shard of SCAs with zero cross-chip communication in the math (the
SCAs are independent), so scaling rides ICI-free data parallelism;
collectives appear only in focal-plane summary reductions.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import l1_to_l2
from ..utils import typefix
from . import spatial  # noqa: F401  (row-shard latency axis)


def sca_mesh(n_devices=None, devices=None):
    """1-D mesh over the ("sca",) axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("sca",))


def broadcast_batch(arrays, n_sca):
    """Replicate a single-SCA array bundle to a leading SCA axis
    (host-side; pair with :func:`shard_batch` to place on the mesh)."""
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        out[k] = np.broadcast_to(v[None], (n_sca,) + v.shape).copy()
    return out


def shard_batch(mesh, arrays):
    """Place a pytree of stacked per-SCA arrays with the leading axis
    sharded over the mesh's "sca" axis."""
    sharding = NamedSharding(mesh, P("sca"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, arrays)


_FPA_CALIBRATOR_CACHE = {}


def make_fpa_calibrator(plan, cfg, geom, mesh):
    """Jitted, sharded L1->L2 calibration over a batch of SCAs.

    Input: dict of arrays with a leading SCA axis (sharded over the
    mesh); output: dict of per-SCA results with the same sharding.

    Cached by (compiled-core identity, mesh): a multi-exposure sweep
    (``batch.py --fpa`` calls :func:`calibrate_fpa` once per exposure)
    must re-dispatch the SAME jitted program, not re-trace — on the
    TPU relay a fresh 4096^2 vmapped-core compile costs minutes.
    """
    # configs differing only in sim/noise-only keys share one compiled
    # batched core
    cfg = l1_to_l2.cal_cfg(cfg)
    ck = (l1_to_l2.core_key(plan, cfg, geom), mesh)
    hit = _FPA_CALIBRATOR_CACHE.get(ck)
    if hit is not None:
        return hit

    core = l1_to_l2.make_core(plan, cfg, geom)
    batched = jax.vmap(core)
    spec = NamedSharding(mesh, P("sca"))

    @partial(jax.jit, out_shardings=spec)
    def run(arrs):
        return batched(arrs)

    _FPA_CALIBRATOR_CACHE[ck] = run
    return run


def calibrate_fpa(configs, mesh=None, write=True, max_workers=8,
                  profile=False):
    """Calibrate a batch of SCAs (one config each) across the mesh.

    The focal-plane production path: per-SCA L1 trees and calibration
    packs are loaded and prepared by a host thread pool, stacked along
    a leading "sca" axis, sharded over the mesh, pushed through one
    batched jitted core execution per *config group*, then unpacked and
    written back in parallel.

    Mixed MA tables / pipeline options are supported: configs are
    grouped by their compiled-core identity (``l1_to_l2.core_key``) and
    each group runs as its own batched execution — the single-exposure
    case (all 18 SCAs share the table) stays one execution.

    Each group's batch is padded to the mesh size by repeating the last
    SCA; the padded lanes are computed and discarded.  That is SPMD
    occupancy, not latency — wall-clock is set by ceil(n_group/ndev)
    steps per chip either way.

    Returns the list of L2 trees (written to each config's OUT when
    ``write``); with ``profile=True`` returns ``(trees, timings)``
    where ``timings`` records host staging (load/prepare thread pool),
    per-group sharded compute, packaging, and write wall-clocks.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from ..io import asdf_lite, calfiles
    from ..pipeline import l1_to_l2

    if mesh is None:
        mesh = sca_mesh()
    timings = {}
    t0 = time.perf_counter()

    def load_one(config):
        # cached loader: stable array identities let the id-keyed
        # ipc_precal / padded-kernel-slab caches hit across exposures
        pack = calfiles.load_caldir_cached(config["CALDIR"])
        l1 = asdf_lite.open(config["IN"])["roman"]
        area = l1_to_l2.area_factor_from_config(config, pack.nside)
        prep = l1_to_l2.prepare_inputs(l1, config, pack, area)
        return l1, prep

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        loaded = list(pool.map(load_one, configs))
    timings["host_staging_s"] = time.perf_counter() - t0

    # group by compiled-core identity (MA table, static cfg, geometry)
    # under cal_cfg — otherwise configs differing only in sim/noise-only
    # keys split into separate padded executions of the SAME program
    groups = {}
    for i, (_, prep) in enumerate(loaded):
        key = l1_to_l2.core_key(
            prep["plan"], l1_to_l2.cal_cfg(prep["cfg"]), prep["geom"]
        )
        groups.setdefault(key, []).append(i)

    ndev = mesh.devices.size
    out_by_index = [None] * len(configs)
    timings["groups"] = []
    for idxs in groups.values():
        tg = time.perf_counter()
        prep0 = loaded[idxs[0]][1]
        batch = {
            k: np.stack([loaded[i][1]["arr"][k] for i in idxs])
            for k in prep0["arr"]
        }
        npad = (-len(idxs)) % ndev
        if npad:
            batch = {
                k: np.concatenate([v] + [v[-1:]] * npad)
                for k, v in batch.items()
            }
        batch = shard_batch(mesh, batch)
        run = make_fpa_calibrator(
            prep0["plan"], prep0["cfg"], prep0["geom"], mesh
        )
        out_all = jax.device_get(run(batch))
        for j, i in enumerate(idxs):
            out_by_index[i] = {k: v[j] for k, v in out_all.items()}
        timings["groups"].append(
            {"n_sca": len(idxs), "pad": npad,
             "compute_s": time.perf_counter() - tg}
        )

    tp = time.perf_counter()
    trees = []
    for i, (config, (l1, prep)) in enumerate(zip(configs, loaded)):
        trees.append(l1_to_l2.package_tree(out_by_index[i], prep, l1, config))
    timings["package_s"] = time.perf_counter() - tp

    if write:
        tw = time.perf_counter()

        def write_one(args):
            config, tree = args
            # same schema-compat step as calibrateimage's write path
            # (dummy float16 chisq/dumo + meta.dummyfields) so --fpa
            # and serial runs produce byte-equivalent file structure
            typefix.fix(tree)
            asdf_lite.AsdfFile(tree).write_to(config["OUT"])

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            list(pool.map(write_one, zip(configs, trees)))
        timings["write_s"] = time.perf_counter() - tw
    timings["total_s"] = time.perf_counter() - t0
    if profile:
        return trees, timings
    return trees


def make_fpa_exposure_runner(prep, pack, layers, mesh, config=None):
    """Full production exposure — sim -> L1 fill -> L2 calibration ->
    noise layers — batched over SCAs and sharded over the ``("sca",)``
    mesh.

    The reference runs this workload as 18 independent Slurm tasks
    (``runs/summer2025run/OpenUniverse_to_L1L2.py:155-169``); here one
    host process drives the whole focal plane: every staged stage is
    ``jit(vmap(stage))`` with outputs sharded over the mesh, so each
    chip computes its shard of SCAs and nothing crosses ICI (the SCA
    math is independent; collectives appear only in summary
    reductions like :func:`fpa_summary`).

    ``run(key, batch)``: ``key`` is ONE exposure-level rbg key (per-SCA
    streams are derived internally — a caller-supplied key ARRAY would
    be silently reduced to lane 0 by the batched rbg bit generator;
    see the lane_keys note in ``noise_core._staged_layer_machinery``),
    ``batch`` the per-SCA array bundle with a leading SCA axis (see
    :func:`shard_batch`); n_sca must be a multiple of the mesh size
    (pad by repeating SCAs, as :func:`calibrate_fpa` does).
    Returns sharded ``(noise_cube, base_out, checksums)``; lane 0
    reproduces a single-SCA staged run keyed with
    ``jax.random.split(key, n_sca)[0]`` (bit-identical RNG stream and
    integer DQ; float maps agree to vmap reduction-order drift ~1e-6),
    the other lanes are independent counter-extended streams
    (statistically gated in ``tests/test_fpa_exposure.py``).
    """
    from ..pipeline import noise_core

    return noise_core.make_staged_exposure_runner(
        prep, pack, layers, config=config, mesh=mesh
    )


def fpa_summary(mesh, slopes):
    """Example focal-plane reduction: per-SCA means gathered across the
    mesh (the ``fpaplot``-style summary path, riding one all-gather)."""
    @jax.jit
    def stats(x):
        return x.mean(axis=(-2, -1)), x.std(axis=(-2, -1))

    return jax.device_get(stats(slopes))
