"""Trajectory dump writers: ``dump custom``/``atom``/``xyz`` text formats
plus the CHARMM/NAMD binary ``dcd`` format (dump_dcd.cpp).

Matches the reference Dump::write (dump.cpp:302) / DumpCustom text layout used
by the examples (columns like ``x y z type mol``), with ``dump_modify sort id``
ordering (our arrays are already id-ordered).
"""

from __future__ import annotations

import numpy as np


_INT_COLS = {"id", "type", "mol"}


def write_dump_frame(spec, sys, script, gmask, f=None):
    x = np.asarray(sys.x)
    v = np.asarray(sys.v)
    mu = np.asarray(sys.mu)
    fv = np.asarray(f) if f is not None else np.zeros_like(x)
    # wrap into the box for output (the engine may keep rigid coords
    # unwrapped) — but only on periodic dims: the reference never remaps
    # f/s/m boundaries (Dump::write, dump.cpp)
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    xw = np.where(per, x - np.floor((x - lo) / L) * L, x)
    ids = np.nonzero(gmask)[0]
    colvec = {
        "id": ids + 1,
        "x": xw[ids, 0], "y": xw[ids, 1], "z": xw[ids, 2],
        # scaled coords (dump atom default)
        "xs": (xw[ids, 0] - lo[0]) / L[0],
        "ys": (xw[ids, 1] - lo[1]) / L[1],
        "zs": (xw[ids, 2] - lo[2]) / L[2],
        "xu": x[ids, 0], "yu": x[ids, 1], "zu": x[ids, 2],
        "type": np.asarray(script.type)[ids],
        "mol": np.asarray(script.mol)[ids],
        "vx": v[ids, 0], "vy": v[ids, 1], "vz": v[ids, 2],
        "q": np.asarray(sys.q)[ids],
        "fx": fv[ids, 0], "fy": fv[ids, 1], "fz": fv[ids, 2],
        "mux": mu[ids, 0], "muy": mu[ids, 1], "muz": mu[ids, 2],
    }
    mode = "a" if getattr(spec, "_started", False) else "w"
    if spec.style == "xyz":
        # dump_xyz.cpp: natoms line, comment, then 'TYPE x y z' rows
        # (element symbol = type number without a dump_modify element map)
        with open(spec.path, mode) as fh:
            fh.write("%d\n" % len(ids))
            fh.write("Atoms. Timestep: %d\n" % int(sys.step))
            for i in ids:
                fh.write("%d %g %g %g\n" % (int(script.type[i]),
                                             xw[i, 0], xw[i, 1], xw[i, 2]))
        spec._started = True
        return
    with open(spec.path, mode) as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % int(sys.step))
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(ids))
        fh.write("ITEM: BOX BOUNDS pp pp pp\n")
        for d in range(3):
            fh.write("%-1.16e %-1.16e\n" % (lo[d], hi[d]))
        fh.write("ITEM: ATOMS " + " ".join(spec.columns) + "\n")
        vals = np.stack([np.asarray(colvec[c], np.float64)
                         for c in spec.columns], axis=1)
        flags = np.array([c in _INT_COLS for c in spec.columns], np.uint8)
        from lidp_tpu import native

        blob = native.format_dump_rows(vals, flags)
        if blob is not None:
            fh.write(blob.decode())
        else:   # pure-Python fallback (no compiler)
            for r in range(vals.shape[0]):
                fh.write(" ".join(
                    str(int(vals[r, c])) if flags[c] else "%g" % vals[r, c]
                    for c in range(vals.shape[1])) + "\n")
    spec._started = True


def _fortran_rec(fh, payload: bytes):
    import struct

    fh.write(struct.pack("<i", len(payload)))
    fh.write(payload)
    fh.write(struct.pack("<i", len(payload)))


def write_dcd_frame(spec, sys, script, gmask):
    """CHARMM-format binary DCD frame (dump_dcd.cpp): 84-byte CORD header +
    title + natoms records once, then per frame a 6-double unit cell record
    and three float32 coordinate records."""
    import struct

    ids = np.nonzero(gmask)[0]
    x = np.asarray(sys.x)
    lo, hi = np.asarray(sys.box.lo), np.asarray(sys.box.hi)
    L = hi - lo
    per = np.asarray(sys.box.periodic, bool)
    xw = np.where(per, x - np.floor((x - lo) / L) * L, x)

    mode = "ab" if getattr(spec, "_started", False) else "wb"
    with open(spec.path, mode) as fh:
        if not getattr(spec, "_started", False):
            # CORD + 9 ints + delta + cell flag + 8 zeros + version = 84 B
            hdr = b"CORD" + struct.pack(
                "<9if9ii", 0, int(sys.step), spec.every, 0, 0, 0, 0, 0, 0,
                float(script.dt), 1, 0, 0, 0, 0, 0, 0, 0, 0, 24)
            _fortran_rec(fh, hdr)
            title = b"Created by lidp_tpu (dump_dcd.cpp format)".ljust(80)
            _fortran_rec(fh, struct.pack("<i", 1) + title)
            _fortran_rec(fh, struct.pack("<i", len(ids)))
        # unit cell: [a, cos(gamma), b, cos(beta), cos(alpha), c]
        cell = struct.pack("<6d", L[0], 0.0, L[1], 0.0, 0.0, L[2])
        _fortran_rec(fh, cell)
        for d in range(3):
            _fortran_rec(fh, xw[ids, d].astype("<f4").tobytes())
    spec._started = True
