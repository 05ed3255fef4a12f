"""Library / scripting API — the analog of the reference's C library interface
and its Python wrapper.

The reference exposes LAMMPS as a library via ``src/library.cpp`` (1122 LoC of
C functions: lammps_open/close/file/command, lammps_extract_global/atom/
compute/variable, lammps_get_natoms, lammps_gather_atoms/scatter_atoms) and
wraps it in ``python/lammps.py`` (985 LoC ctypes class ``lammps``).  Here the
engine is already Python/JAX, so the same surface is a thin native class —
no ctypes, same method names and semantics so driver scripts port directly.

Reference citations per method are to python/lammps.py unless noted.
"""

from __future__ import annotations

import numpy as np

__version__ = 20260816   # date-coded like lammps_version (library.cpp)


class lammps:
    """In-process lidp_tpu instance driven by LAMMPS commands.

    Mirrors python/lammps.py:  class lammps(name='', cmdargs=None).
    cmdargs accepts the CLI flags our interpreter understands (-log, -echo,
    -var name value) — python/lammps.py:40-70 passes these to lammps_open.
    """

    def __init__(self, name: str = "", cmdargs=None, dtype=None):
        from lidp_tpu.io.script import LammpsScript

        log = None
        self._var_overrides = {}
        args = list(cmdargs or [])
        i = 0
        while i < len(args):
            a = args[i]
            if a in ("-log", "-l"):
                log = args[i + 1]
                i += 2
            elif a in ("-var", "-v"):
                self._var_overrides[args[i + 1]] = args[i + 2]
                i += 3
            elif a in ("-echo", "-e", "-screen", "-sc"):
                i += 2
            else:
                i += 1
        if log and log != "none":
            self._log_fh = open(log, "w")
            logfn = lambda s: (self._log_fh.write(s + "\n"),
                               self._log_fh.flush())
        else:
            self._log_fh = None
            logfn = None
        self.lmp = LammpsScript(dtype=dtype, log=logfn)
        for k, v in self._var_overrides.items():
            self.lmp.variables[k] = v

    # ---- lifecycle -------------------------------------------------------
    def close(self):
        """lammps_close (python/lammps.py:86)."""
        if self._log_fh:
            self._log_fh.close()
            self._log_fh = None
        self.lmp = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def version(self) -> int:
        """lammps_version (python/lammps.py:92)."""
        return __version__

    # ---- command input ---------------------------------------------------
    def file(self, path: str):
        """Run an entire input script — lammps_file (python/lammps.py:96)."""
        self.lmp.file(path)

    def command(self, cmd: str):
        """Execute one command — lammps_command (python/lammps.py:100)."""
        self.lmp.one(cmd)

    def commands_list(self, cmdlist):
        """python/lammps.py commands_list."""
        self.lmp.execute(list(cmdlist))

    def commands_string(self, multicmd: str):
        """python/lammps.py commands_string."""
        self.lmp.execute(multicmd.splitlines())

    # ---- global state ----------------------------------------------------
    def get_natoms(self) -> int:
        """lammps_get_natoms (python/lammps.py:237)."""
        return 0 if self.lmp.x is None else int(self.lmp.x.shape[0])

    def set_fix_external_callback(self, fix_id: str, func, caller=None):
        """lammps_set_fix_external_callback (library.cpp): register the
        force-provider for a `fix ID group external pf/callback` fix.
        The callback signature is func(caller, step, nlocal, ids, x,
        fexternal) and must fill fexternal in place; it is invoked at
        run-chunk setup (the XLA step is traced once, so per-step
        callbacks are not possible — pf/array cadence)."""
        spec = self.lmp.fixes[fix_id]
        spec._callback = func
        spec._caller = caller
        self.lmp._invalidate()

    def fix_external_set_force(self, fix_id: str, f):
        """Set the per-atom force array of a `fix external pf/array` fix
        (FixExternal::set_force analog); takes effect on the next run."""
        import numpy as np

        spec = self.lmp.fixes[fix_id]
        spec._fexternal = np.asarray(f, float)
        self.lmp._invalidate()

    def get_thermo(self, name: str) -> float:
        """Current value of a thermo keyword — lammps_get_thermo
        (library.cpp thermo branch; python/lammps.py:230).

        Evaluates thermo on the CURRENT state (forces recomputed if a run
        has happened); supported keys match our thermo_row columns plus
        step/vol/density.
        """
        row = self._thermo()
        if name not in row:
            raise KeyError(f"unknown thermo keyword {name!r}; "
                           f"have {sorted(row)}")
        return float(row[name])

    def _thermo(self) -> dict:
        sim = self._sim()
        if sim.res is None:
            # establish forces/energies without advancing (setup only)
            sim.run(0)
        return sim._thermo_row()

    def _sim(self):
        from lidp_tpu.sim import Simulation

        if self.lmp._sim is None:
            self.lmp._sim = Simulation.from_script(self.lmp)
        return self.lmp._sim

    def extract_global(self, name: str, _type=None):
        """Scalar globals — lammps_extract_global (library.cpp; names per
        its dispatch table: dt, ntimestep, boxlo/boxhi, natoms, ntypes,
        boltz, hplanck, ...)."""
        s = self.lmp
        u = s.units
        vals = {
            "dt": s.dt, "ntimestep": int(s.step), "natoms": self.get_natoms(),
            "ntypes": int(s.ntypes),
            "boxxlo": float(s.box_lo[0]), "boxxhi": float(s.box_hi[0]),
            "boxylo": float(s.box_lo[1]), "boxyhi": float(s.box_hi[1]),
            "boxzlo": float(s.box_lo[2]), "boxzhi": float(s.box_hi[2]),
            "boltz": u.boltz, "mvv2e": u.mvv2e, "ftm2v": u.ftm2v,
            "qqr2e": u.qqr2e, "nktv2p": u.nktv2p,
        }
        if name not in vals:
            raise KeyError(f"unknown global {name!r}")
        return vals[name]

    def extract_box(self):
        """(boxlo, boxhi, xy, yz, xz, periodicity, box_change) —
        python/lammps.py:150 extract_box."""
        s = self.lmp
        per = [1 if b.startswith("p") else 0
               for b in getattr(s, "boundary", "p p p").split()[:3]]
        return (list(map(float, s.box_lo)), list(map(float, s.box_hi)),
                0.0, 0.0, 0.0, per, 0)

    # ---- per-atom data ---------------------------------------------------
    _ATOM_FIELDS = ("x", "v", "f", "q", "type", "mol", "id", "mass", "image",
                    "mu", "static_polarizability", "ef_static")

    def extract_atom(self, name: str, _type=None) -> np.ndarray:
        """Per-atom array snapshot — lammps_extract_atom (library.cpp per-atom
        dispatch; the fork adds static_polarizability / mu_induced /
        ef_static at atom.h:161-162).  Returns a numpy copy in id order
        (our arrays are id-ordered; no ghost rows)."""
        s = self.lmp
        sim = s._sim
        sysv = sim.sys if sim is not None else None
        n = self.get_natoms()
        if name == "id":
            return np.arange(1, n + 1, dtype=np.int64)
        if name == "x":
            return np.asarray(sysv.x if sysv is not None else s.x, np.float64)
        if name == "v":
            return np.asarray(sysv.v if sysv is not None else s.v, np.float64)
        if name == "f":
            if sim is None or sim.res is None:
                self._thermo()
                sim = s._sim
            return np.asarray(sim.res.f, np.float64)[:n]
        if name == "q":
            return np.asarray(sysv.q if sysv is not None else s.q, np.float64)
        if name == "type":
            return np.asarray(s.type, np.int64)
        if name in ("mol", "molecule"):
            return np.asarray(s.mol, np.int64)
        if name == "mass":
            return np.asarray(s.mass_type, np.float64)   # per-type like LAMMPS
        if name == "image":
            return (np.asarray(sysv.image, np.int64)
                    if sysv is not None else np.zeros((n, 3), np.int64))
        if name in ("mu", "mu_induced"):
            return (np.asarray(sysv.mu, np.float64)
                    if sysv is not None else np.zeros((n, 3)))
        if name in ("static_polarizability", "alpha"):
            return np.asarray(s.alpha_type[s.type], np.float64)
        raise KeyError(f"unknown per-atom field {name!r}; "
                       f"have {self._ATOM_FIELDS}")

    def gather_atoms(self, name: str, _type=None, _count=None) -> np.ndarray:
        """Id-ordered global array — lammps_gather_atoms
        (python/lammps.py:262).  Single process: same as extract_atom."""
        return self.extract_atom(name)

    def scatter_atoms(self, name: str, data, _type=None, _count=None):
        """Write per-atom data back — lammps_scatter_atoms
        (python/lammps.py:280)."""
        import jax.numpy as jnp

        s = self.lmp
        arr = np.asarray(data)
        n = self.get_natoms()
        if arr.shape[0] != n:
            raise ValueError(f"scatter_atoms {name}: got {arr.shape[0]} rows "
                             f"for {n} atoms")
        if name in ("x", "v", "q"):
            setattr(s, name, arr.astype(np.float64))
            if s._sim is not None:
                sim = s._sim
                sim.sys = sim.sys.replace(
                    **{name: jnp.asarray(arr, s.dtype)})
                sim.res = None   # stale forces
        elif name == "type":
            s.type = arr.astype(np.int32)
            s._sim = None        # type tables changed: rebuild
        else:
            raise KeyError(f"scatter_atoms: unsupported field {name!r}")

    # ---- variables / computes --------------------------------------------
    def extract_variable(self, name: str, group=None, _type=None):
        """python/lammps.py:207 extract_variable (equal-style evaluates
        its expression now; index/loop/string return the string)."""
        try:
            return float(self.lmp.var_value(name))
        except KeyError:
            raise KeyError(f"no variable {name!r}")
        except ValueError:
            return self.lmp.variables.get(name)

    def set_variable(self, name: str, value) -> int:
        """python/lammps.py:252 set_variable."""
        self.lmp.variables[name] = str(value)
        return 0

    def extract_compute(self, cid: str, style=None, _type=None):
        """lammps_extract_compute: scalars (temp, group/group), vectors
        (msd: 4 components), arrays (rdf: (Nbin,3) r/g(r)/coord)."""
        sim = self._sim()
        if cid in getattr(sim, "rdf_computes", {}):
            if sim.res is None:
                sim.run(0)
            return sim.compute_rdf(cid)
        row = self._thermo()
        if f"c_{cid}[1]" in row:            # vector compute (msd)
            out = []
            k = 1
            while f"c_{cid}[{k}]" in row:
                out.append(float(row[f"c_{cid}[{k}]"]))
                k += 1
            return np.asarray(out)
        key = "c_" + cid
        if key not in row:
            raise KeyError(f"no compute {cid!r}")
        return float(row[key])


class PyLammps:
    """Convenience wrapper mirroring python/lammps.py's PyLammps: commands as
    attributes (L.pair_style(...), L.run(10)), ``lmp`` underneath."""

    def __init__(self, name: str = "", cmdargs=None):
        self.lmp = lammps(name, cmdargs)

    def __getattr__(self, cmd):
        if cmd.startswith("_"):
            raise AttributeError(cmd)

        def call(*args):
            line = " ".join([cmd] + [str(a) for a in args])
            self.lmp.command(line)

        return call

    @property
    def atoms(self):
        return self.lmp.get_natoms()

    def eval(self, expr: str) -> float:
        return self.lmp.get_thermo(expr)
