"""Configuration handling: YAML configs, READS decoding, noise-layer DSL.

The reference drives everything from plain YAML dicts with UPPERCASE
keys and two embedded mini-languages (SURVEY.md §5): the READS
flattened-pair read-pattern encoding (``sim_to_isim.py:970-974``) and
the noise-layer command strings like ``'Rz4PbrS2C1'``
(``gen_noise_image.py:33-57``, spec ``docs/L1_to_L2_README.rst:207-239``).
"""

import re

import yaml


def resolve_backend(config, key, tpu_choice="pallas"):
    """Resolve a ``*_BACKEND`` config key to a concrete backend name.

    'auto' (the default) picks the fastest measured backend for the
    platform: ``tpu_choice`` when the default JAX backend is TPU, 'xla'
    otherwise (the Pallas CPU interpreter is orders of magnitude slower
    than XLA:CPU, so auto never selects it off-TPU).  A/B measurements
    behind each tpu_choice live in docs/performance.md.
    """
    v = str(config.get(key, "auto")).lower()
    if v != "auto":
        return v
    import jax

    return tpu_choice if jax.default_backend() == "tpu" else "xla"


def load_config(path):
    with open(path) as f:
        return yaml.safe_load(f)


def reads_to_pattern(reads):
    """Flattened READS pair list -> MA read pattern (list of lists).

    ``[0,1, 1,2, 2,4]`` -> ``[[0], [1], [2, 3]]``; dropped frames are
    allowed (a pair's end below the next pair's start).
    """
    if len(reads) % 2 != 0:
        raise ValueError("READS must have an even number of entries")
    pattern = []
    for j in range(len(reads) // 2):
        lo, hi = int(reads[2 * j]), int(reads[2 * j + 1])
        if hi <= lo:
            raise ValueError(f"READS pair ({lo},{hi}) is empty")
        pattern.append(list(range(lo, hi)))
    return pattern


def pattern_to_reads(read_pattern):
    """Inverse of :func:`reads_to_pattern` (for provenance output)."""
    out = []
    for g in read_pattern:
        out.extend([int(g[0]), int(g[-1]) + 1])
    return out


def layer_subscript(cmd, ch):
    """Subscript of a capital-letter directive in a noise-layer command.

    ``layer_subscript('RS2Pg4', 'S') -> '2'``;
    ``layer_subscript('RS2Pg4', 'P') -> 'g4'``.
    Reference: ``gen_noise_image._get_subscript:33-57``.
    """
    return re.split(r"(?=[A-Z])", cmd.split(ch)[-1])[0]
