"""Tests for bit utilities, orientation, denoise_construct, and the
pseudocalibrate shortcut."""

import numpy as np

from romanimpreprocess_tpu.galpoisson import denoise_construct, find_tilnus
from romanimpreprocess_tpu.utils.bitutils import convert_uint32_to_bits
from romanimpreprocess_tpu.utils.orientation import get_orientation


def test_bits_roundtrip():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 2**31, (7, 9)).astype(np.uint32)
    arr[0, 0] = 2**31 + 5
    bits = convert_uint32_to_bits(arr)
    assert bits.shape == (32, 7, 9)
    recon = np.zeros_like(arr)
    for j in range(32):
        recon |= bits[j].astype(np.uint32) << np.uint32(j)
    assert np.array_equal(recon, arr)


def test_orientation_basic():
    """At roll chosen so the FPA is aligned, the field center is offset
    from the pointing by the boresight offset, and the 18 SCA centers
    cluster within ~0.6 deg of the field center."""
    tree = {
        "roman": {
            "meta": {
                "wcsinfo": {"ra_ref": 80.0, "dec_ref": -69.0, "roll_ref": 0.0}
            }
        }
    }
    o = get_orientation(tree)
    assert abs(o["dec"] - (-69.0)) < 1.0
    dra = (o["ra"] - 80.0 + 180) % 360 - 180
    assert abs(dra) < 2.0
    assert o["ra_sca"].shape == (18,)
    # all SCAs within ~0.7 deg of the field center
    dd = o["dec_sca"] - o["dec"]
    dr = ((o["ra_sca"] - o["ra"] + 180) % 360 - 180) * np.cos(
        np.deg2rad(o["dec"])
    )
    assert np.all(np.hypot(dd, dr) < 0.7)
    # left/right halves of the focal plane are distinct
    assert np.std(dr) > 0.05


def test_orientation_roll_moves_pa():
    base = {
        "roman": {"meta": {"wcsinfo": {"ra_ref": 10.0, "dec_ref": 5.0,
                                       "roll_ref": 0.0}}}
    }
    rolled = {
        "roman": {"meta": {"wcsinfo": {"ra_ref": 10.0, "dec_ref": 5.0,
                                       "roll_ref": 30.0}}}
    }
    pa0 = get_orientation(base)["pa"]
    pa1 = get_orientation(rolled)["pa"]
    dpa = (pa1 - pa0 + 180) % 360 - 180
    assert abs(abs(dpa) - 30.0) < 1.0


def test_denoise_construct_matches_fast_tilnus():
    """The O(N^4) tensor construction and the O(N^2) cumulative-sum
    algorithm must agree — the same cross-validation the reference
    enables by keeping both implementations."""
    cases = [
        (np.array([1, 2, 4, 4, 4, 1]), np.array([2, 3, 5, 23, 44, 49]),
         np.array([-0.1, -0.4, -0.2, 0.2, 0.4, 0.1])),
        (np.array([1, 2, 3, 5, 2, 1]), np.array([0, 1, 3, 6, 11, 13]),
         None),
    ]
    for N_beta, a_beta, W in cases:
        if W is None:
            W = np.linspace(-1, 1, len(N_beta))
            W -= W.mean()
        slow = denoise_construct.get_tilde_nus(N_beta, a_beta, W)
        fast = find_tilnus.get_tilde_nus(N_beta, a_beta, W)
        for s, f in zip(slow, fast):
            assert np.isclose(s, f, rtol=1e-10), (s, f)


def test_denoise_from_list():
    grps = [[0], [1], [2, 3], [4, 5, 6]]
    wt = np.array([-0.2, -0.1, 0.1, 0.2])
    a = denoise_construct.get_tilde_nus_from_list(grps, wt)
    b = find_tilnus.get_tilde_nus(
        np.array([1, 1, 2, 3]), np.array([0, 1, 2, 4]), wt
    )
    assert np.allclose(a, b)


def test_get_orientation_accepts_path(tmp_path):
    """pathlib.Path inputs must route through asdf_lite.open like str
    (reference accepts str | pathlib.Path, orientation.py:42)."""
    import pathlib

    from romanimpreprocess_tpu.io import asdf_lite

    tree = {
        "roman": {
            "meta": {
                "wcsinfo": {"ra_ref": 10.0, "dec_ref": -20.0,
                            "roll_ref": 30.0},
            }
        }
    }
    p = tmp_path / "l1.asdf"
    asdf_lite.AsdfFile(tree).write_to(str(p))
    o_path = get_orientation(pathlib.Path(p))
    o_tree = get_orientation(tree)
    assert o_path["ra"] == o_tree["ra"] and o_path["pa"] == o_tree["pa"]
