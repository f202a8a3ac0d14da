"""Spatial (row-shard) sharding of one SCA's calibration.

The production parallelism is the ("sca",) batch axis
(:mod:`romanimpreprocess_tpu.parallel`): SCAs are independent, so a
v5e-8 runs 18 of them with zero collectives in the math — that is what
the <1 s focal-plane north star uses.  This module is the
complementary latency axis from SURVEY.md §2.4: shard the 4096^2 frame
itself over a ("row",) mesh so ONE exposure's calibration runs on many
chips (fewer SCAs than chips, interactive recalibration, or very large
future detectors).

Design: the UNCHANGED calibration core (``l1_to_l2.make_core``) is run
under its usual ``jit`` with inputs committed to row shardings — XLA's
SPMD partitioner propagates the sharding through the program and
inserts the collectives itself (halo exchanges for the IPC stencil and
the 3x3 saturation grow, all-gathers/all-reduces for the refpix row
and channel medians, the WFI18 row fit, the smooth-mode sky histogram,
and the medfit Legendre solve).  This is the scaling-book recipe —
annotate shardings, let XLA insert collectives — and it keeps ONE
source of truth for the math: there is no hand-sharded fork of the
core to drift out of parity.  The row axis is chosen because every
per-row reduction in the chain (refpix row medians, WFI18 profile)
then stays shard-local; only the short cross-row reductions
communicate.

Numerics: integer outputs (pdq/rdq/endslice) are bit-exact vs the
single-device core; float maps differ only by reduction-order drift
(gated at 1e-4 relative in ``tests/test_spatial.py``).

Reference anchor: the reference has no intra-frame parallelism at all
(single-process numpy; SURVEY.md §2.4) — this surface is TPU-native
headroom, not a port.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import l1_to_l2


def row_mesh(n_devices=None, devices=None):
    """1-D mesh over the ("row",) axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("row",))


def row_spec(v, nside, nborder):
    """PartitionSpec sharding the row (y) axis of one calibration-
    bundle array.

    Frames and cubes carry rows in axis -2 (full ``nside`` or active
    ``nside - 2*nborder`` height — e.g. ``biascorr``); the amp33 block
    is (nside, channelwidth) so its rows are axis 0; everything at
    metadata scale (weight tables, Legendre coefficient vectors,
    scalars) is replicated.
    """
    v = np.asarray(v)
    rows = {nside, nside - 2 * nborder}
    if v.ndim == 3 and v.shape[1] in rows:
        return P(None, "row", None)
    if v.ndim == 2 and v.shape[0] in rows:
        return P("row", None)
    return P()


def shard_rows(mesh, arrs, geom):
    """Commit a calibration array bundle to the ("row",) mesh.

    Row-bearing arrays are sharded over their row axis; metadata-scale
    arrays are replicated.  ``device_put`` (unlike ``jit``) cannot pad
    uneven shards, so an array whose row count does not divide the mesh
    (e.g. the active-height ``biascorr`` at 4088 rows on a 16-way mesh)
    is committed replicated instead — XLA reshards it inside the jit,
    where padding IS supported, so the math is unaffected.  Returns the
    device-committed dict — pass it straight to the core from
    :func:`make_spatial_calibrator`.
    """
    nside, nb, _ = geom
    ndev = int(mesh.devices.size)

    def put(v):
        spec = row_spec(v, nside, nb)
        axis = tuple(spec).index("row") if "row" in tuple(spec) else None
        if axis is not None and np.asarray(v).shape[axis] % ndev:
            spec = P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in arrs.items()}


def sca_row_mesh(n_sca, n_row, devices=None):
    """2-D ("sca", "row") mesh: batch axis x spatial axis.

    For partial focal planes on larger slices (e.g. 4 SCAs on a v5e-8:
    4x2 — each SCA row-sharded over 2 chips), combining the zero-
    collective batch axis with the row-shard latency axis.
    """
    if devices is None:
        devices = jax.devices()[: n_sca * n_row]
    return Mesh(np.array(devices).reshape(n_sca, n_row), ("sca", "row"))


def shard_batch_rows(mesh, arrays, geom):
    """Commit a STACKED per-SCA bundle (leading SCA axis, cf.
    ``parallel.shard_batch``) to a ("sca", "row") mesh: the leading
    axis shards over "sca", each lane's row axis over "row".

    Used with the ordinary batched calibrator
    (``parallel.make_fpa_calibrator`` / a ``jit(vmap(core))``) — the
    committed input shardings select the SPMD-partitioned executable,
    exactly as in the 1-D cases.  Arrays whose row count does not
    divide the "row" axis are committed sharded over "sca" only.
    """
    nside, nb, _ = geom
    n_row = int(dict(zip(mesh.axis_names, mesh.devices.shape))["row"])

    def put(v):
        v = np.asarray(v)
        inner = row_spec(v[0], nside, nb) if v.ndim else P()
        spec = P("sca", *tuple(inner))
        if "row" in tuple(inner):
            axis = 1 + tuple(inner).index("row")
            if v.shape[axis] % n_row:
                spec = P("sca")
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in arrays.items()}


def make_spatial_calibrator(plan, cfg, geom, mesh):
    """The L1->L2 calibration core for row-sharded execution.

    Returns the SAME cached jitted core as single-device use
    (``l1_to_l2._get_core``) — committed input shardings select the
    SPMD-partitioned executable, so there is no separate "distributed
    core" object to cache or keep in parity.  ``mesh`` is accepted for
    symmetry/future explicit-sharding needs; the partitioning itself is
    driven entirely by the inputs from :func:`shard_rows`.

    Usage::

        mesh = spatial.row_mesh()
        core = spatial.make_spatial_calibrator(plan, cfg, geom, mesh)
        out = core(spatial.shard_rows(mesh, arrs, geom))

    Outputs come back row-sharded (XLA propagates the spec); fetch with
    ``np.asarray`` or keep them on the mesh for downstream stages.
    """
    del mesh  # input shardings drive the partitioning
    return l1_to_l2._get_core(plan, cfg, geom)
