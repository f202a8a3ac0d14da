"""Exposure-level pipelines: sim->L1 synthesis, L1->L2 calibration,
Monte-Carlo noise realizations.

Each pipeline is a host driver (config/YAML + ASDF/FITS I/O + WCS
metadata) around a single jitted device core operating on the
HBM-resident (ngrp, nside, nside) cube — the file-mediated stage
boundaries of the reference become in-memory array handoffs.
"""
