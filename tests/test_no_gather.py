"""HLO-level regression gates against TPU gather lowerings.

Codebase rule (CLAUDE.md / SURVEY.md perf notes): per-pixel lookups
from small tables must lower as where-select chains, never as gathers —
a single full-frame gather regression costs ~400 ms/frame on v5e.  The
likelihood fitter historically used ``jnp.take_along_axis`` over the
variant axis (round-2 VERDICT weak #3); these tests pin the fix by
asserting the lowered StableHLO of the hot jitted cores contains no
gather ops at all (cf. reference production fitters
``gen_cal_image.py:415-445``, which we must match WITHOUT the gather).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _stablehlo(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def _assert_no_gather(text, what):
    # StableHLO spells it "stablehlo.gather"/"stablehlo.dynamic_gather";
    # match any gather-flavored op but not e.g. "all_gather" collectives
    # (none expected in these single-device cores either, but be exact).
    bad = [ln.strip() for ln in text.splitlines()
           if ".gather" in ln or "dynamic_gather" in ln]
    assert not bad, f"{what} lowers with gather ops: {bad[:3]}"


def test_likelihood_fitter_has_no_gather():
    from romanimpreprocess_tpu.ops import likely, ramp

    rp = [[0], [1, 2], [3, 4, 5], [6, 7], [8]]
    meta = ramp.ma_table_meta(rp, 3.04)
    meta["nborder"] = 0
    plan = likely.build_likely_plan(meta, exclude_first=False,
                                    rejection_threshold=4.5)
    ngrp, ny, nx = len(rp), 16, 16
    data = jnp.zeros((ngrp, ny, nx), jnp.float32)
    rdq = jnp.zeros((ngrp, ny, nx), jnp.uint32)
    pdq = jnp.zeros((ny, nx), jnp.uint32)
    gain = jnp.ones((ny, nx), jnp.float32)
    sig = jnp.ones((ny, nx), jnp.float32)

    text = _stablehlo(
        lambda d, r, p, g, s: likely.ramp_fit_likely(
            d, r, p, plan, g, s, nborder=1),
        data, rdq, pdq, gain, sig,
    )
    _assert_no_gather(text, "ramp_fit_likely")


def test_classic_ramp_fitter_has_no_gather():
    from romanimpreprocess_tpu.ops import ramp

    rp = [[0], [1, 2], [3, 4, 5], [6, 7], [8]]
    meta = ramp.ma_table_meta(rp, 3.04)
    plan = ramp.build_plan(meta, u=1.0, exclude_first=False)
    ngrp, ny, nx = len(rp), 16, 16
    data = jnp.zeros((ngrp, ny, nx), jnp.float32)
    rdq = jnp.zeros((ngrp, ny, nx), jnp.uint32)
    pdq = jnp.zeros((ny, nx), jnp.uint32)
    gain = jnp.ones((ny, nx), jnp.float32)
    sig = jnp.ones((ny, nx), jnp.float32)

    text = _stablehlo(
        lambda d, r, p, g, s: ramp.ramp_fit(d, r, p, plan, g, s,
                                            nborder=1),
        data, rdq, pdq, gain, sig,
    )
    _assert_no_gather(text, "ramp_fit")
