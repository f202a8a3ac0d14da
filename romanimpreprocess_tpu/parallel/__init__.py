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


def sca_mesh(n_devices=None, devices=None):
    """1-D mesh over the ("sca",) axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("sca",))


def shard_batch(mesh, arrays):
    """Place a pytree of stacked per-SCA arrays with the leading axis
    sharded over the mesh's "sca" axis."""
    sharding = NamedSharding(mesh, P("sca"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, arrays)


def make_fpa_calibrator(plan, cfg, geom, mesh):
    """Jitted, sharded L1->L2 calibration over a batch of SCAs.

    Input: dict of arrays with a leading SCA axis (sharded over the
    mesh); output: dict of per-SCA results with the same sharding.
    """
    core = l1_to_l2.make_core(plan, cfg, geom)
    batched = jax.vmap(core)
    spec = NamedSharding(mesh, P("sca"))

    @partial(jax.jit, out_shardings=spec)
    def run(arrs):
        return batched(arrs)

    return run


def fpa_summary(mesh, slopes):
    """Example focal-plane reduction: per-SCA means gathered across the
    mesh (the ``fpaplot``-style summary path, riding one all-gather)."""
    @jax.jit
    def stats(x):
        return x.mean(axis=(-2, -1)), x.std(axis=(-2, -1))

    return jax.device_get(stats(slopes))
