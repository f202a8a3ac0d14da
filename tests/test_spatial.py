"""Row-sharded (spatial) single-SCA calibration on the virtual mesh.

The spatially-sharded path must be the SAME math as the single-device
core: integer outputs bit-exact, float maps within reduction-order
drift.  XLA's SPMD partitioner owns the collectives (halo exchange for
IPC/saturation-grow, all-reduces for the refpix/sky medians); there is
no hand-sharded fork to test separately — these gates pin the whole
partitioned execution.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from romanimpreprocess_tpu import benchlib
from romanimpreprocess_tpu.parallel import spatial
from romanimpreprocess_tpu.pipeline import l1_to_l2


def _run_pair(nside, n_devices, likelihood=False):
    arr, plan, cfg, geom = benchlib.core_bundle(
        nside=nside, likelihood=likelihood
    )
    core = l1_to_l2._get_core(plan, cfg, geom)
    ref = core({k: jnp.asarray(v) for k, v in arr.items()})
    ref = {k: np.asarray(v) for k, v in ref.items()}

    mesh = spatial.row_mesh(n_devices)
    dist_core = spatial.make_spatial_calibrator(plan, cfg, geom, mesh)
    assert dist_core is core  # one source of truth, no forked math
    out = jax.block_until_ready(
        dist_core(spatial.shard_rows(mesh, arr, geom))
    )
    return ref, out


def _gate(ref, out):
    for k, a in ref.items():
        b = np.asarray(out[k])
        assert a.shape == b.shape, k
        if a.dtype.kind in "ui":
            assert np.array_equal(a, b), f"{k}: integer mismatch"
        else:
            drift = np.max(np.abs(a - b) / (1.0 + np.abs(a))) if a.size else 0.0
            # chisq sums squared residuals over groups — reduction
            # reassociation drifts it slightly more than the maps
            tol = 1e-3 if k in ("chisq", "dumo") else 1e-4
            assert drift < tol, f"{k}: drift {drift}"


def test_row_sharded_core_matches_single_device():
    ref, out = _run_pair(nside=64, n_devices=8)
    _gate(ref, out)
    # outputs stay row-sharded (no implicit gather at the end)
    spec = out["slope"].sharding.spec
    assert tuple(spec)[:1] == ("row",)


def test_row_sharding_survives_uneven_division():
    # 64 rows over 5 devices: device_put cannot pad uneven shards, so
    # shard_rows falls back to replicated commits and XLA reshards
    # inside the jit; results must be unchanged
    ref, out = _run_pair(nside=64, n_devices=5)
    _gate(ref, out)


def test_row_sharded_likelihood_fitter():
    ref, out = _run_pair(nside=64, n_devices=8, likelihood=True)
    _gate(ref, out)


def test_row_spec_classification():
    nside, nb = 64, 4
    assert tuple(spatial.row_spec(np.zeros((5, 64, 64)), nside, nb)) == (
        None, "row", None,
    )
    assert tuple(spatial.row_spec(np.zeros((5, 56, 56)), nside, nb)) == (
        None, "row", None,
    )
    assert tuple(spatial.row_spec(np.zeros((64, 16)), nside, nb)) == (
        "row", None,
    )
    # metadata-scale arrays replicate
    assert tuple(spatial.row_spec(np.zeros((5,)), nside, nb)) == ()
    assert tuple(spatial.row_spec(np.float32(1.0), nside, nb)) == ()
    assert tuple(spatial.row_spec(np.zeros((3, 3)), nside, nb)) == ()


@pytest.mark.parametrize("n_devices", [2])
def test_row_sharded_dq_determinism(n_devices):
    # two identical sharded runs must agree bit-for-bit (uint32 DQ is
    # the determinism contract; float maps must also be run-to-run
    # identical for a fixed executable)
    arr, plan, cfg, geom = benchlib.core_bundle(nside=64)
    mesh = spatial.row_mesh(n_devices)
    core = spatial.make_spatial_calibrator(plan, cfg, geom, mesh)
    arrs = spatial.shard_rows(mesh, arr, geom)
    o1 = jax.block_until_ready(core(arrs))
    o2 = jax.block_until_ready(core(arrs))
    for k in o1:
        assert np.array_equal(np.asarray(o1[k]), np.asarray(o2[k])), k


def test_row_sharded_full_config_with_wfi18(tmp_path):
    """Spatial sharding through a REAL config path (synth cal files,
    WFI18 transient row fit, sky medfit, SLICEOUT endslice): the global
    row regression and block-median stages must survive partitioning."""
    import numpy as np

    from romanimpreprocess_tpu.io import asdf_lite, calfiles
    from romanimpreprocess_tpu.pipeline import sim_to_l1
    from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

    N = 128
    rp = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits",
                            nside_active=N - 8, nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", rp, nside=N, seed=5)
    reads = []
    for g in rp:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config({"IN": scene, "OUT": d + "/L1.asdf",
                          "READS": reads, "CALDIR": caldir, "SEED": 200})

    # relabel as WFI18 so the transient row fit runs
    f = asdf_lite.open(d + "/L1.asdf")
    tree = dict(f.tree)
    tree["roman"] = dict(tree["roman"])
    tree["roman"]["meta"] = dict(tree["roman"]["meta"])
    tree["roman"]["meta"]["instrument"] = dict(
        tree["roman"]["meta"]["instrument"], detector="WFI18")
    asdf_lite.AsdfFile(tree).write_to(d + "/L1_18.asdf")

    config = {"IN": d + "/L1_18.asdf", "FITSWCS": d + "/L1_asdf_wcshead.txt",
              "CALDIR": caldir, "SKYORDER": 2, "SLICEOUT": True,
              "correct_wfi18_transient": True}
    pack = calfiles.load_caldir_cached(caldir)
    l1 = asdf_lite.open(d + "/L1_18.asdf")["roman"]
    area = l1_to_l2.area_factor_from_config(config, pack.nside)
    prep = l1_to_l2.prepare_inputs(l1, config, pack, area)

    core = l1_to_l2._get_core(prep["plan"], prep["cfg"], prep["geom"])
    ref = {k: np.asarray(v) for k, v in core(
        {k: jnp.asarray(v) for k, v in prep["arr"].items()}).items()}

    mesh = spatial.row_mesh(8)
    out = jax.block_until_ready(core(
        spatial.shard_rows(mesh, prep["arr"], prep["geom"])))
    _gate(ref, out)


def test_sca_row_2d_mesh_batched_core():
    """2-D ("sca","row") mesh: two SCAs batched, each row-sharded over
    4 devices — per-lane results must match the single-device core."""
    import numpy as np

    arr1, plan, cfg, geom = benchlib.core_bundle(nside=64, seed=1000)
    arr2, plan2, cfg2, _ = benchlib.core_bundle(nside=64, seed=2000)
    assert l1_to_l2.core_key(plan, cfg, geom) == l1_to_l2.core_key(
        plan2, cfg2, geom)  # same compiled-core identity, different cal

    core = l1_to_l2._get_core(plan, cfg, geom)
    refs = []
    for arr in (arr1, arr2):
        out = core({k: jnp.asarray(v) for k, v in arr.items()})
        refs.append({k: np.asarray(v) for k, v in out.items()})

    mesh = spatial.sca_row_mesh(2, 4)
    batch = {
        k: np.stack([np.asarray(arr1[k]), np.asarray(arr2[k])])
        for k in arr1
    }
    batched = jax.jit(jax.vmap(core))
    out = jax.block_until_ready(
        batched(spatial.shard_batch_rows(mesh, batch, geom))
    )
    for lane, ref in enumerate(refs):
        _gate(ref, {k: np.asarray(v)[lane] for k, v in out.items()})
