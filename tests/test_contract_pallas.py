"""Streaming read-axis contraction kernel vs einsum (interpret mode).

``ops.contract_pallas.contract_reads`` implements the
cumulative-membership contraction of per-read Poisson increments into
MultiAccum resultants (reference semantics
``from_sim/sim_to_isim.py:233-242``).  The TPU-compiled path is an A/B
candidate driven by ``tools/profile_contract.py``; here the math is
gated against ``einsum`` on the CPU interpreter, including non-tile
row counts (tail-band padding) and the sim core wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romanimpreprocess_tpu.ops import contract_pallas

rng = np.random.RandomState(7)


@pytest.mark.parametrize("ngrp,nreads,ny,nx,th",
                         [(6, 14, 96, 128, 32),
                          (5, 11, 130, 256, 32),
                          (3, 7, 64, 384, 16)])
def test_contract_matches_einsum(ngrp, nreads, ny, nx, th):
    T = jnp.asarray(rng.normal(size=(ngrp, nreads)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(nreads, ny, nx)).astype(np.float32))
    want = np.einsum("jr,ryx->jyx", np.asarray(T), np.asarray(x))
    got = np.asarray(contract_pallas.contract_reads(T, x, th=th,
                                                    interpret=True))
    scale = np.abs(want).max()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_sim_core_contract_option_traces():
    """The contract='pallas' sim core must trace/lower (execution on
    CPU requires the interpreter, so only abstract evaluation is
    gated here; hardware A/B lives in tools/profile_contract.py)."""
    from romanimpreprocess_tpu.pipeline import sim_to_l1

    rp = [[0], [1, 2], [3, 4, 5]]
    core = sim_to_l1._l1_core_factory(rp, 3.04, False, False, False,
                                      contract="pallas")
    na = 64
    arrs = {
        "gain_act": jnp.ones((na, na), jnp.float32),
        "gain": jnp.ones((na + 8, na + 8), jnp.float32),
        "resetnoise_act": jnp.ones((na, na), jnp.float32),
        "read_sigma_act": jnp.ones((na, na), jnp.float32),
        "dark_slope_act": jnp.zeros((na, na), jnp.float32),
        "lin_coefs": jnp.zeros((3, na + 8, na + 8), jnp.float32),
        "lin_smin": jnp.zeros((na + 8, na + 8), jnp.float32),
        "lin_smax": jnp.full((na + 8, na + 8), 6e4, jnp.float32),
        "lin_sref": jnp.zeros((na + 8, na + 8), jnp.float32),
        "lin_dq": jnp.zeros((na + 8, na + 8), jnp.uint32),
    }
    key = jax.random.key(0)
    rate = jnp.full((na, na), 2.0, jnp.float32)
    out_shape = jax.eval_shape(core, key, rate, arrs)
    assert out_shape[0].shape == (len(rp), na, na)


def test_contract_backend_config_plumbing():
    """CONTRACT_BACKEND reaches the compiled cores: the sim run-config
    key, the L1->L2 prepare_inputs cfg, and the staged-machinery
    config-level override (benchlib preps carry no run config)."""
    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import noise_core

    arr, prep, pack = benchlib.exposure_bundle(nside=64)
    m = noise_core._staged_layer_machinery(
        prep, pack, {"CONTRACT_BACKEND": "pallas"}
    )
    assert m.cfg["contract"] == "pallas"
    m2 = noise_core._staged_layer_machinery(prep, pack, None)
    assert m2.cfg.get("contract", "dot") == "dot"


def test_cal_core_shared_across_contract_backend():
    """The calibration core never reads the read-axis contraction
    backend (sim/noise-only key): flipping CONTRACT_BACKEND must NOT
    recompile a byte-identical cal program (minutes per compile on the
    TPU relay)."""
    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    arr, plan, cfg, geom = benchlib.core_bundle(nside=64)
    c1 = l1_to_l2._get_core(plan, dict(cfg, contract="dot"), geom)
    c2 = l1_to_l2._get_core(plan, dict(cfg, contract="pallas"), geom)
    assert c1 is c2
