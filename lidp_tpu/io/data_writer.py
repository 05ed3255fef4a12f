"""LAMMPS data-file writer — the inverse of io/data_reader.py
(write_data.cpp: header + Masses + Atoms + Velocities + bonded sections).

State is taken from the live Simulation if one exists (post-run coordinates)
else from the interpreter arrays.
"""

from __future__ import annotations

import numpy as np


def write_data(path: str, script):
    sim = getattr(script, "_sim", None)
    if sim is not None and sim.sys is not None:
        x = np.asarray(sim.sys.x)
        v = np.asarray(sim.sys.v)
        lo = np.asarray(sim.sys.box.lo)
        hi = np.asarray(sim.sys.box.hi)
        # wrap into the (possibly barostat-changed) box like write_data.cpp
        L = hi - lo
        x = x - np.floor((x - lo) / L) * L
    else:
        x = np.asarray(script.x)
        v = (np.asarray(script.v) if script.v is not None
             else np.zeros_like(x))
        lo, hi = script.box_lo, script.box_hi
    n = x.shape[0]
    q = script.q if script.q is not None else np.zeros(n)
    mol = script.mol if script.mol is not None else np.zeros(n, int)
    full = script.atom_style == "full"

    bonds = getattr(script, "_bonds", None)
    angles = getattr(script, "_angles", None)
    dihedrals = getattr(script, "_dihedrals", None)
    impropers = getattr(script, "_impropers", None)

    def count(arr):
        return 0 if arr is None else len(arr)

    with open(path, "w") as fh:
        fh.write("LAMMPS data file via lidp_tpu write_data\n\n")
        fh.write(f"{n} atoms\n")
        fh.write(f"{script.ntypes} atom types\n")
        for name, arr, coeffs in (
                ("bonds", bonds, script.bond_coeffs),
                ("angles", angles, script.angle_coeffs),
                ("dihedrals", dihedrals, script.dihedral_coeffs),
                ("impropers", impropers, script.improper_coeffs)):
            if count(arr):
                fh.write(f"{count(arr)} {name}\n")
                fh.write(f"{max(coeffs.keys(), default=1)} "
                         f"{name[:-1]} types\n")
        fh.write(f"\n{lo[0]:.16g} {hi[0]:.16g} xlo xhi\n")
        fh.write(f"{lo[1]:.16g} {hi[1]:.16g} ylo yhi\n")
        fh.write(f"{lo[2]:.16g} {hi[2]:.16g} zlo zhi\n")
        if script.mass_type is not None:
            fh.write("\nMasses\n\n")
            for t in range(1, script.ntypes + 1):
                fh.write(f"{t} {script.mass_type[t]:.16g}\n")
        fh.write("\nAtoms\n\n")
        for i in range(n):
            if full:
                fh.write(f"{i+1} {int(mol[i])} {int(script.type[i])} "
                         f"{q[i]:.16g} {x[i,0]:.16g} {x[i,1]:.16g} "
                         f"{x[i,2]:.16g}\n")
            else:
                fh.write(f"{i+1} {int(script.type[i])} "
                         f"{x[i,0]:.16g} {x[i,1]:.16g} {x[i,2]:.16g}\n")
        fh.write("\nVelocities\n\n")
        for i in range(n):
            fh.write(f"{i+1} {v[i,0]:.16g} {v[i,1]:.16g} {v[i,2]:.16g}\n")
        for name, arr, types in (
                ("Bonds", bonds, getattr(script, "_bond_types", None)),
                ("Angles", angles, getattr(script, "_angle_types", None)),
                ("Dihedrals", dihedrals,
                 getattr(script, "_dihedral_types", None)),
                ("Impropers", impropers,
                 getattr(script, "_improper_types", None))):
            if count(arr):
                fh.write(f"\n{name}\n\n")
                for k, row in enumerate(np.asarray(arr)):
                    t = int(types[k]) if types is not None else 1
                    fh.write(f"{k+1} {t} "
                             + " ".join(str(int(b)) for b in row) + "\n")
