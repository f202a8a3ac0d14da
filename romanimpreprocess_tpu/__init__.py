"""romanimpreprocess_tpu — TPU-native Roman WFI image preprocessing.

A ground-up JAX/XLA/Pallas re-implementation of the capabilities of
``Roman-HLIS-Cosmology-PIT/romanimpreprocess``: OpenUniverse truth image
-> Level-1 up-the-ramp simulation with full detector physics, and
Level-1 -> Level-2 calibration (reference pixels, linearity, IPC, ramp
fitting with jump detection, dark/flat/sky), plus the Monte-Carlo noise
realization engine and calibration-file production tools.

Design: device-resident (ngrp, 4096, 4096) cubes, shape-static jitted
pipelines, masked dense compute instead of data-dependent branching,
``jax.sharding`` over an ("sca",) mesh axis for focal-plane batching.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (ROMAN_XLA_CACHE=0 to disable): on
# the axon TPU relay, remote compiles are minutes each through a single
# global queue; caching executables on local disk makes every repeated
# program shape (bench reruns, tests, production batches) load in
# seconds instead.  See utils/compilecache.py for the measurements.
from .utils import compilecache as _compilecache

_compilecache.enable()
del _compilecache
