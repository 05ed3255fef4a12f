"""units si/cgs/micro/nano constants (update.cpp:190-240) and dump xyz
(dump_xyz.cpp format)."""

import numpy as np


def test_unit_systems():
    from lidp_tpu import units

    si = units.get("si")
    assert si.boltz == 1.3806504e-23 and si.qqr2e == 8.9876e9
    assert si.dt == 1.0e-8 and si.skin == 0.001
    cgs = units.get("cgs")
    assert cgs.boltz == 1.3806504e-16 and cgs.qqr2e == 1.0
    micro = units.get("micro")
    assert micro.qqr2e == 8.987556e6 and micro.dt == 2.0
    nano = units.get("nano")
    assert nano.boltz == 0.013806504 and nano.dt == 0.00045


def test_dump_xyz(tmp_path):
    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = str(tmp_path)
    s.execute(f"""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
dump d1 all xyz 1 traj.xyz
run 2
""".strip().splitlines())
    lines = (tmp_path / "traj.xyz").read_text().splitlines()
    n = 32   # 2^3 fcc cells x 4 basis
    assert lines[0] == str(n)
    assert lines[1].startswith("Atoms. Timestep:")
    row = lines[2].split()
    assert row[0] == "1" and len(row) == 4
    # three frames (steps 0,1,2)
    assert len(lines) == 3 * (n + 2)


def test_dump_dcd(tmp_path):
    """dump dcd (dump_dcd.cpp): CHARMM binary format readable by MDAnalysis
    conventions — validated by manual record parsing."""
    import struct

    import numpy as np

    from lidp_tpu.io.script import LammpsScript

    s = LammpsScript()
    s.root = str(tmp_path)
    s.execute("""
units lj
atom_style atomic
lattice fcc 0.8442
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
pair_style lj/cut 2.5
pair_coeff 1 1 1.0 1.0 2.5
fix 1 all nve
dump d1 all dcd 1 traj.dcd
run 2
""".strip().splitlines())
    raw = (tmp_path / "traj.dcd").read_bytes()

    def rec(off):
        n = struct.unpack_from("<i", raw, off)[0]
        payload = raw[off + 4:off + 4 + n]
        n2 = struct.unpack_from("<i", raw, off + 4 + n)[0]
        assert n == n2
        return payload, off + 8 + n

    hdr, off = rec(0)
    assert len(hdr) == 84 and hdr[:4] == b"CORD"
    _, off = rec(off)               # title
    nat, off = rec(off)
    n = struct.unpack("<i", nat)[0]
    assert n == 32
    # three frames (steps 0,1,2), each: cell + x + y + z records
    for frame in range(3):
        cell, off = rec(off)
        a, cg, b, cb, ca, c = struct.unpack("<6d", cell)
        assert a > 3.0 and b == a and c == a
        xs, off = rec(off)
        ys, off = rec(off)
        zs, off = rec(off)
        assert len(xs) == 4 * n
    assert off == len(raw)
    x0 = np.frombuffer(xs, "<f4")
    assert np.isfinite(x0).all()
