"""P-flat, saturation, and bias-correction production.

Equivalent of the reference's ``postprocess_calfiles.py``
(``runs/summer2025run/postprocess_calfiles.py:1-172``):

- **pflat**: the linearity file's pflat plane normalized by its own
  order-2 medfit (removing the L-flat-scale structure) and rescaled by
  ``g_ideal / median(gain)``; outliers clipped to [0.01, 1.99] and
  flagged,
- **saturation**: ``Smax - 1`` with dq where the linearity solution is
  inverted (Smax <= Sref),
- **biascorr**: the observed group-averaged dark minus the dark
  forward-modeled through the inverse linearity per raw read — the
  per-read inverse-linearity evaluations (the reference's slowest
  production loop) run as one jitted device scan.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import pars
from ..config import reads_to_pattern
from ..io import asdf_lite, calfiles
from ..ops import linearity, sky


def _meta(reftype, sca):
    from . import ref_meta

    return ref_meta(reftype, sca, f"calib.postprocess ({reftype})")


def make_pflat_file(lin_file, gain_file, out_path, sca, medfit_N=6):
    """pflat = pflat / medfit(pflat) * g_ideal / median(gain)."""
    lin = asdf_lite.open(lin_file)["roman"]
    gain = asdf_lite.open(gain_file)["roman"]["data"]
    pflat = np.asarray(lin["pflat"])
    if pflat.ndim == 3:
        pflat = pflat[0]
    pflat = pflat.astype(np.float64)

    _, pfmed = sky.medfit(jnp.asarray(pflat), N=medfit_N, order=2)
    pflat = pflat / np.asarray(pfmed)
    pflat = pflat * pars.g_ideal / np.median(gain)

    dq = np.zeros(pflat.shape, dtype=np.uint32)
    dq |= np.where((pflat < 0.01) | (pflat > 1.99), 1, 0).astype(np.uint32)
    pflat = np.clip(pflat, 0.01, 1.99)

    asdf_lite.AsdfFile(
        {
            "roman": {
                "meta": _meta("PFLAT", sca),
                "data": pflat.astype(np.float32),
                "dq": dq,
            },
            "notes": {"src": lin_file},
        }
    ).write_to(out_path)
    return out_path


def make_saturation_file(lin_file, out_path, sca):
    """saturation = Smax - 1, flagged where Smax <= Sref."""
    lin = asdf_lite.open(lin_file)["roman"]
    smax = np.clip(np.asarray(lin["Smax"]), 1, 65535).astype(np.float32)
    dq = np.where(
        np.asarray(lin["Smax"]) > np.asarray(lin["Sref"]), 0, 1
    ).astype(np.uint32)
    asdf_lite.AsdfFile(
        {
            "roman": {
                "meta": _meta("SATURATION", sca),
                "data": smax - 1,
                "dq": dq,
            },
            "notes": {"src": lin_file},
        }
    ).write_to(out_path)
    return out_path


@partial(jax.jit, static_argnames=("ngrp", "nreads"))
def _predicted_dark_run(dark_dn_frame, lin_pack, g_of_r, wgt, xref, *,
                        ngrp, nreads):
    def body(r, acc):
        slin = dark_dn_frame * (r - xref)
        s_raw, _ = linearity.invert_linearity(slin, lin_pack)
        return acc.at[g_of_r[r]].add(s_raw * wgt[r], mode="drop")

    acc0 = jnp.zeros((ngrp + 1,) + dark_dn_frame.shape, jnp.float32)
    return jax.lax.fori_loop(0, nreads, body, acc0)[:ngrp]


def predicted_dark_cube(dark_slope_act, lin_pack, read_pattern, frame_time,
                        xref):
    """Forward-model the dark through the inverse linearity per read and
    average within groups.  Jitted; returns (ngrp, na, na) float32.

    ``xref`` is the (fractional) frame index at which the linearized
    signal is zero (the bias reference frame).  The linearity pack and
    the read->group tables ride as jit ARGUMENTS (closing the full-frame
    coefficient stack over the jit would embed ~0.7 GB of HLO constants
    — the axon relay's HTTP 413 failure mode — and re-create the
    compiled program per call).
    """
    ngrp = len(read_pattern)
    lastread = read_pattern[-1][-1]
    g_of_r = np.full(lastread + 1, ngrp, np.int32)
    wgt = np.zeros(lastread + 1, np.float32)
    for j, grp in enumerate(read_pattern):
        for r in grp:
            g_of_r[r] = j
            wgt[r] = 1.0 / len(grp)

    return np.asarray(_predicted_dark_run(
        jnp.asarray(dark_slope_act * frame_time), lin_pack,
        jnp.asarray(g_of_r), jnp.asarray(wgt), jnp.float32(xref),
        ngrp=ngrp, nreads=lastread + 1,
    ))


def make_biascorr_file(lin_file, dark_file, out_path, sca, reads,
                       frame_time=3.04, bias_frame=1):
    """biascorr = observed group-averaged dark - forward-modeled dark.

    ``bias_frame`` indexes the READS pair whose center defines the zero
    of the linearized signal (the reference's linearity-fit BIAS SLICE).
    """
    nb = pars.nborder
    read_pattern = reads_to_pattern(reads)
    dark = asdf_lite.open(dark_file)["roman"]
    lin_tree = asdf_lite.open(lin_file)["roman"]
    nside = np.asarray(lin_tree["Smin"]).shape[0]
    act = slice(nb, nside - nb)

    lin_pack = linearity.LinearityData(
        jnp.asarray(np.asarray(lin_tree["data"])[:, act, act]),
        jnp.asarray(np.asarray(lin_tree["Smin"])[act, act]),
        jnp.asarray(np.asarray(lin_tree["Smax"])[act, act]),
        jnp.asarray(np.asarray(lin_tree["Sref"])[act, act]),
        jnp.asarray(np.asarray(lin_tree["dq"])[act, act]),
    )

    xref = (reads[2 * bias_frame] + reads[2 * bias_frame + 1] - 1) / 2.0
    dark_slope_act = np.asarray(dark["dark_slope"])[act, act]
    predicted = predicted_dark_cube(
        dark_slope_act, lin_pack, read_pattern, frame_time, xref
    )
    observed = np.asarray(dark["data"])[:, act, act].astype(np.float32)
    bias_corr = observed - predicted

    asdf_lite.AsdfFile(
        {
            "roman": {
                "meta": _meta("BIASCORR", sca),
                "data": bias_corr.astype(np.float32),
                "t0": float(frame_time * xref),
                "t0_comment": (
                    "seconds after reset defining Sref (0 DN_lin)"
                ),
            }
        }
    ).write_to(out_path)
    return out_path


def main(argv=None):
    """``postprocess <linearitylegendre_file> <sca> <pattern>`` — the
    reference's ``postprocess_calfiles.py`` CLI: derives the gain input
    and the pflat/saturation/biascorr outputs by the
    ``_linearitylegendre_`` name substitution, with READS from
    ``settings_<pattern>.yaml`` (override with ``--settings``)."""
    import argparse

    import yaml

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("infile", help="linearitylegendre ASDF (name contains "
                                  "'_linearitylegendre_')")
    p.add_argument("sca", type=int)
    p.add_argument("pattern", help="MultiAccum pattern name")
    p.add_argument("--settings", default=None)
    p.add_argument("--frame-time", type=float, default=3.04)
    p.add_argument("--bias-frame", type=int, default=1)
    a = p.parse_args(argv)

    if "_linearitylegendre_" not in a.infile:
        p.error("input name must contain '_linearitylegendre_'")
    settings = a.settings or f"settings_{a.pattern}.yaml"
    with open(settings) as f:
        reads = [int(r) for r in yaml.safe_load(f)["READS"]]

    sub = a.infile.replace
    print(">>", make_pflat_file(
        a.infile, sub("_linearitylegendre_", "_gain_"),
        sub("_linearitylegendre_", "_pflat_"), a.sca))
    print(">>", make_saturation_file(
        a.infile, sub("_linearitylegendre_", "_saturation_"), a.sca))
    print(">>", make_biascorr_file(
        a.infile, sub("_linearitylegendre_", "_dark_"),
        sub("_linearitylegendre_", "_biascorr_"), a.sca, reads,
        frame_time=a.frame_time, bias_frame=a.bias_frame))
    return 0


if __name__ == "__main__":
    import sys as _sys

    _sys.exit(main())
