"""delete_atoms overlap/porosity goldens vs the REBUILT reference binary
(/tmp/lmpsrc/lmp_serial, LAMMPS 16Mar18 fork).

overlap cut g1 g2 (delete_atoms.cpp:260 DeleteAtoms::delete_overlap):
sequential serial sweep — atom i (group1) is deleted when some
not-yet-deleted atom j (group2) lies within cut.  On the 4^3 fcc 0.8442
lattice with cut 1.2 > nn distance 1.1876, `overlap 1.2 left all`
deletes 159 of the 160 left-half atoms (each left atom sees a
surviving neighbor until the sweep ends), reference log:
"Deleted 159 atoms, new total = 97".

porosity region frac seed (delete_atoms.cpp:420): one RanMars(seed)
uniform per in-region atom in atom order, delete when <= frac;
reference deletes 46 of the 160 half-region atoms with seed 78421.

Since nothing moves, parity is checked on the surviving coordinate
set: sha256 over the sorted %.8f rows of the remaining positions
(lattice fills are bit-exact between the engines, so the rounded
strings match exactly).
"""

import hashlib

import numpy as np
import pytest

HEAD = """units lj
atom_style atomic
boundary p p p
lattice fcc 0.8442
region box block 0 4 0 4 0 4
create_box 2 box
create_atoms 1 box
mass 1 1.0
mass 2 1.0
region half block 0 2 0 4 0 4
group left region half
set group left type 2
pair_style lj/cut 2.5
pair_coeff * * 1.0 1.0
"""

# (extra commands, expected surviving count, sha256 of sorted coords)
CASES = {
    "overlap": (
        "delete_atoms overlap 1.2 left all\n"
        "delete_atoms porosity half 0.3 78421\n",
        97,
        "d47bd1cc9679de81f461f4722e5db6c9dc6dd03563397fd4ce5f37b508adb571",
    ),
    "porosity": (
        "delete_atoms porosity half 0.3 78421\n",
        210,
        "8b6a2e3447d891c815ecdf1e63b2197a068e98e5dc9e5cc932a9187e51fb9014",
    ),
}


def _fingerprint(x):
    a = np.array(sorted(map(tuple, np.asarray(x, np.float64))))
    s = "\n".join(" ".join(f"{v:.8f}" for v in r) for r in a)
    return hashlib.sha256(s.encode()).hexdigest()


def test_delete_overlap_cross_boundary_ghost_rule(tmp_path):
    """Asymmetric group pair whose only contacts cross the periodic
    boundary: delete_atoms.cpp:404-407 treats the (serial) ghost-j case
    specially — mutual candidate pairs tie-break on tags, non-mutual
    pairs delete i regardless of dlist[j].  Golden: the rebuilt
    reference deletes 32 atoms leaving exactly this surviving
    coordinate set (same sorted-%.8f sha as the other cases)."""
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    head = (HEAD.replace("region half block 0 2 0 4 0 4\n"
                         "group left region half\n"
                         "set group left type 2\n", "")
            + "region rL block 0 0.6 0 4 0 4\n"
              "region rR block 3.4 4 0 4 0 4\n"
              "group edgeL region rL\n"
              "group edgeR region rR\n"
              "delete_atoms overlap 1.2 edgeL edgeR\n")
    path = tmp_path / "in.case"
    path.write_text(head)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    assert s.x.shape[0] == 224
    assert _fingerprint(s.x) == (
        "28173ca644ebb91c39010fbfbde47abdbe47a5730d6b39ebf434004443329c3d")


@pytest.mark.parametrize("case", sorted(CASES))
def test_delete_atoms_golden(case, tmp_path):
    import jax.numpy as jnp

    from lidp_tpu.io.script import LammpsScript

    extra, n_expected, sha = CASES[case]
    path = tmp_path / "in.case"
    path.write_text(HEAD + extra)
    s = LammpsScript(dtype=jnp.float64)
    s.file(str(path))
    assert s.x.shape[0] == n_expected
    assert _fingerprint(s.x) == sha
