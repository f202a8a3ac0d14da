"""Metadata-driven sky background model (utils/skymodel.py).

The reference derives its blank sky image from pointing/filter/date
metadata via romanisim ``simulate_counts``
(``from_sim/sim_to_isim.py:596,637``); here the analytic model must
show the same qualitative structure (ecliptic-latitude and filter
dependence, thermal floor) and feed the simulator by default with
``SKY_RATE`` still acting as an override.
"""

import numpy as np
import pytest

from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file
from romanimpreprocess_tpu.utils import skymodel

# the synthetic test pointing (synth.make_scene_file defaults)
RA, DEC, DATE = 37.0, -20.0, "2026-01-01"


def test_f184_pinned_at_test_pointing():
    v = skymodel.sky_background_rate("F184", RA, DEC, DATE)
    assert v == pytest.approx(0.3981, abs=2e-3)


def test_ecliptic_latitude_variation():
    # north ecliptic pole vs in-plane anti-solar line of sight: the
    # zodiacal term must rise by the documented ~2-3x
    pole = skymodel.sky_background_rate("F158", 270.0, 66.56, "2026-03-20")
    plane = skymodel.sky_background_rate("F158", 0.0, 0.0, "2025-12-21")
    th = skymodel.THERMAL["F158"]
    assert 1.8 < (plane - th) / (pole - th) < 3.5


def test_filter_dependence():
    args = (RA, DEC, DATE)
    # ultra-wide F146 collects ~3x the zodi of the wide filters;
    # F213 is thermal-dominated
    assert skymodel.sky_background_rate("F146", *args) > 2 * (
        skymodel.sky_background_rate("F158", *args)
    )
    assert skymodel.sky_background_rate("F213", *args) > 4.0
    # unknown filter falls back to F158 levels
    assert skymodel.sky_background_rate("XYZW", *args) == (
        skymodel.sky_background_rate("F158", *args)
    )


def test_elongation_bounded():
    for lam_deg in range(0, 360, 30):
        f = skymodel.zodi_factor(0.0, np.radians(lam_deg))
        assert 0.6 * 1.0 <= f <= 1.8 * 2.9


def test_sim_uses_model_by_default_and_sky_rate_overrides(tmp_path):
    """Default run_config (no SKY_RATE) must inject the model's sky;
    SKY_RATE=0 must remove it — visible as a drop in the accumulated
    background of the final resultant, with Poisson variance following."""
    d = str(tmp_path)
    rp = [[0], [1, 2], [3, 4], [5, 6]]
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=56,
                            nstars=0)
    caldir = make_cal_files(d + "/cal", rp, nside=64, seed=7)
    reads = []
    for g in rp:
        reads += [g[0], g[-1] + 1]
    base = {"IN": scene, "READS": reads, "CALDIR": caldir, "SEED": 11}
    sim_to_l1.run_config(dict(base, OUT=d + "/L1_model.asdf"))
    sim_to_l1.run_config(dict(base, OUT=d + "/L1_zero.asdf", SKY_RATE=0.0))
    sim_to_l1.run_config(dict(base, OUT=d + "/L1_big.asdf", SKY_RATE=20.0))
    diff = {}
    for tag in ("model", "zero", "big"):
        r = asdf_lite.open(d + f"/L1_{tag}.asdf")["roman"]
        a = np.asarray(r["data"], np.float64)[:, 4:-4, 4:-4]
        diff[tag] = a[-1] - a[0]  # accumulated charge over the ramp, DN
    m_model, m_zero, m_big = (np.median(diff[t]) for t in ("model", "zero", "big"))
    assert m_model > m_zero + 1.0  # model sky accumulates real charge
    assert m_big > m_model + 50.0  # override respected (20 e/s >> model)
    # Poisson budget flows through the ramp: more sky -> more per-pixel
    # spread in the accumulated charge (fixed pattern cancels in the
    # first-to-last difference)
    assert diff["big"].std() > 1.15 * diff["zero"].std()
