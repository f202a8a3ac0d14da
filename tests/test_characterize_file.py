"""make_linearity_file: the fitted reference file closes the loop
through the L1->L2 linearity correction."""

import jax.numpy as jnp
import numpy as np

from romanimpreprocess_tpu.calib import characterize
from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.ops import linearity

N = 48


def test_make_linearity_file_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    Smin = np.full((N, N), 4000.0, np.float32)
    Smax = (55000 + 2000 * rng.uniform(size=(N, N))).astype(np.float32)
    Sref = (Smin + 900).astype(np.float32)
    data = np.zeros((4, N, N), np.float32)
    data[2] = 120 + 40 * rng.uniform(size=(N, N))
    z = 2 * (Sref - Smin) / (Smax - Smin) - 1
    data[1] = (Smax - Smin) / 2.0 - 3 * data[2] * z
    data[0] = -data[1] * z - data[2] * (1.5 * z**2 - 0.5)
    lin = linearity.LinearityData(
        jnp.asarray(data), jnp.asarray(Smin), jnp.asarray(Smax),
        jnp.asarray(Sref), jnp.zeros((N, N), jnp.uint32),
    )

    ts = np.arange(1, 18) * 3.04
    ramps = [
        np.stack(
            [
                np.asarray(
                    linearity.invert_linearity(
                        jnp.full((N, N), a * t, jnp.float32), lin
                    )[0]
                )
                for t in ts
            ]
        ).astype(np.float32)
        for a in (800.0, 180.0)
    ]
    sref_frame = np.asarray(
        linearity.invert_linearity(jnp.zeros((N, N)), lin)[0]
    )

    path = characterize.make_linearity_file(
        str(tmp_path / "lin.asdf"), 7, ramps, [ts, ts], sref_frame,
        p_order=5, n_iter=5,
    )
    tree = asdf_lite.open(path)["roman"]
    assert tree["meta"]["reftype"] == "LINEARITYLEGENDRE"
    assert tree["data"].shape[0] == 6
    fitted = linearity.LinearityData(
        jnp.asarray(tree["data"]), jnp.asarray(tree["Smin"]),
        jnp.asarray(tree["Smax"]), jnp.asarray(tree["Sref"]),
        jnp.asarray(tree["dq"]),
    )
    # forward/backward through the fitted file stays consistent
    S = sref_frame + 8000.0
    slin, _ = linearity.apply_linearity(jnp.asarray(S, jnp.float32), fitted)
    sback, _ = linearity.invert_linearity(slin, fitted)
    assert np.abs(np.asarray(sback) - S).max() < 0.1
    # and the fitted response matches the true one at mid-range
    want, _ = linearity.apply_linearity(jnp.asarray(S, jnp.float32), lin)
    rel = np.median(
        np.abs(np.asarray(slin) - np.asarray(want))
        / np.maximum(np.abs(np.asarray(want)), 100.0)
    )
    assert rel < 0.03, rel
