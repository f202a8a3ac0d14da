"""Host-side I/O: minimal ASDF and FITS backends (no asdf/astropy needed)."""

from . import asdf_lite, fits_lite  # noqa: F401
