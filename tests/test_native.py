"""Native (C++) runtime components must be bit-equal to the Python fallbacks."""

import numpy as np
import pytest

from lidp_tpu import native, rng, topology


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_special_lists_match(lib):
    rs = np.random.RandomState(3)
    natoms = 200
    # random tree-ish bonds
    bonds = np.array([[i + 1, rs.randint(max(1, i - 3), i + 1)]
                      for i in range(1, natoms)], np.int64)
    nat = native.special_lists(natoms, bonds)
    assert nat is not None
    idx_n, lvl_n = nat
    # python fallback
    per_atom = topology._special_sets(natoms, bonds)
    for i, (a, b, c) in enumerate(per_atom):
        got = {(int(j), int(l)) for j, l in zip(idx_n[i], lvl_n[i])
               if j < natoms}
        want = {(j, 1) for j in a} | {(j, 2) for j in b} | {(j, 3) for j in c}
        assert got == want, i


def test_velocity_stream_match(lib):
    n = 500
    for dist in ("uniform", "gaussian"):
        nat = native.velocity_stream(12345, n, dist)
        r = rng.RanPark(12345)
        ref = np.zeros((n, 3))
        for i in range(n):
            if dist == "uniform":
                ref[i] = (r.uniform() - 0.5, r.uniform() - 0.5,
                          r.uniform() - 0.5)
            else:
                ref[i] = (r.gaussian(), r.gaussian(), r.gaussian())
        np.testing.assert_array_equal(nat, ref)


def test_parse_atoms_full(lib):
    text = """1 1 2 -0.5 1.0 2.0 3.0 # comment
2 1 1 0.5 -1.5 0.25 7.5 1 0 -1

3 2 2 0.0 4.0 5.0 6.0
"""
    out = native.parse_atoms_full(text, 3)
    assert out is not None
    np.testing.assert_allclose(out["x"][1], [-1.5, 0.25, 7.5])
    assert out["type"].tolist() == [2, 1, 2]
    assert out["mol"].tolist() == [1, 1, 2]
    assert out["image"][1].tolist() == [1, 0, -1]
    np.testing.assert_allclose(out["q"], [-0.5, 0.5, 0.0])
