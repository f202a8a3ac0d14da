"""Calibration-reference-file production (the reference's ``runs/`` layer).

Builders for the CALDIR reference files from raw detector test data:

- :mod:`.convert`     — merge per-frame FITS exposures into ramp cubes
  with detector->science flips and slope extensions
  (``runs/summer2025run/convert_dark.py`` etc.)
- :mod:`.make_dark`   — sigma-clipped group-averaged dark cube + dark
  slope + read/reset-noise files (``make_dark_file.py``)
- :mod:`.make_gain`   — gain map + 4D IPC kernel from solid-waffle
  correlation summaries (``make_gain_file.py``)
- :mod:`.postprocess` — p-flat, saturation, and bias-correction files
  from the linearity solution (``postprocess_calfiles.py``)
- :mod:`.makemask`    — pixel mask from flat/dark thresholds
  (``makemask.py`` incl. the 2026_July gain-dq variant)
- :mod:`.swconfig`    — solid-waffle / linearity-fit configuration
  emitters (the reference's Perl generators, in Python)

Hot loops (sigma-clipped stacking, the per-read inverse-linearity
forward model for the bias correction) run jitted on device.
"""

from datetime import datetime, timezone

from .. import __version__


def ref_meta(reftype, sca, description, exposure=None,
             author="romanimpreprocess_tpu.calib"):
    """Shared reference-file ``meta`` block (SOC-style provenance, cf.
    reference ``make_dark_file.py:106-138``).

    Single source for the provenance fields — the builders previously
    each carried a near-identical copy that had already started to
    drift (characterize's lacked the exposure block).
    """
    meta = {
        "author": author,
        "description": description,
        "instrument": {"detector": f"WFI{sca:02d}", "name": "WFI"},
        "origin": "PIT - romanimpreprocess_tpu",
        "date": datetime.now(timezone.utc).isoformat(),
        "pedigree": "DUMMY",
        "reftype": reftype,
        "telescope": "ROMAN",
        "useafter": "2020-01-01T00:00:00.000",
        "software_version": __version__,
    }
    if exposure is not None:
        meta["exposure"] = exposure
    return meta
