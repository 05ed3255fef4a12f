"""LAMMPS input-script interpreter.

Executes the command subset used by the reference's bundled inputs
(bench/in.lj, polarization/examples/*): the reference's Input::file/one
dispatch (input.cpp:151,286,761) with $-substitution (input.cpp:330) and
simple equal-style variable arithmetic (variable.cpp).

Command-order semantics are preserved — notably `units` resets the timestep
to the style default (update.cpp set_units), which is why the polarization
examples (where `timestep 2` precedes `units real`) effectively run dt=1.

The interpreter accumulates configuration host-side; `run N` assembles the
jitted simulation (System + ForceField + integrator + thermo) and advances it.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional

import numpy as np

from lidp_tpu import units as units_mod
from lidp_tpu import velocity as velocity_mod
from lidp_tpu import lattice as lattice_mod
from lidp_tpu.io.data_reader import read_data

_RAMP_RE = re.compile(
    r"^ramp\(\s*([0-9.eE+-]+)\s*,\s*([0-9.eE+-]+)\s*\)$")
# bare-number detector for optional positional args (e.g. the pair_style
# polarization grammar's optional cut_coul before keywords)
_NUM_RE = re.compile(r"^[\d eE+\-*/().]+$")


def _read_pair_table(path: str, keyword: str):
    """Read one section of a LAMMPS pair table file (pair_table.cpp
    read_table): 'KEYWORD' line, 'N n ...' params, rows 'i r E F'."""
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        t = lines[i].split("#")[0].strip()
        if t == keyword or t.split()[:1] == [keyword]:
            break
        i += 1
    else:
        raise ValueError(f"table keyword {keyword!r} not found in {path}")
    i += 1
    n = None
    while i < len(lines):
        t = lines[i].split("#")[0].split()
        if t and t[0] == "N":
            n = int(t[1])
            i += 1
            break
        i += 1
    if n is None:
        raise ValueError(f"no N line after keyword {keyword!r}")
    rows = []
    while i < len(lines) and len(rows) < n:
        t = lines[i].split("#")[0].split()
        if len(t) >= 4:
            rows.append((float(t[1]), float(t[2]), float(t[3])))
        i += 1
    r = np.array([x[0] for x in rows])
    e = np.array([x[1] for x in rows])
    f = np.array([x[2] for x in rows])
    return r, e, f


def _yesno(tok: str) -> bool:
    if tok == "yes":
        return True
    if tok == "no":
        return False
    raise ValueError(f"expected yes/no, got {tok!r}")


@dataclasses.dataclass
class PairStyleSpec:
    name: str = ""
    cut_lj_global: float = 0.0
    cut_coul: float = 0.0
    cut_lj_inner: float = 0.0   # CHARMM switching inner cutoff
    # polarization keywords, defaults per constructor (...polarization.cpp:63-79)
    iterations_max: int = 50
    damping_type: str = "none"
    polar_damp: float = 2.1304
    zodid: bool = False
    polar_precision: float = 1e-11
    fixed_iteration: bool = False
    polar_gs: bool = False
    polar_gs_ranked: bool = True
    polar_gamma: float = 1.03
    use_previous: bool = False
    debug: bool = False
    # TIP4P off-site charge: (typeO, typeH, typeB, typeA, qdist)
    # (pair_lj_cut_tip4p_long.cpp settings :431-454)
    tip4p: tuple = None
    # "long" (erfc + kspace) or "cut" (pair_tip4p_cut.cpp bare Coulomb)
    tip4p_mode: str = "long"
    # CHARMM/GROMACS coulomb switching inner cutoff
    cut_coul_inner: float = 0.0


@dataclasses.dataclass
class FixSpec:
    fid: str
    group: str
    style: str
    args: list


@dataclasses.dataclass
class DumpSpec:
    did: str
    group: str
    style: str
    every: int
    path: str
    columns: list
    sort_id: bool = False
    float_fmt: str = "%g"   # dump_modify format float


class LammpsScript:
    """Host-side interpreter state + executor."""

    def __init__(self, root: str = ".", dtype=None, log=None,
                 thermo_callback=None, speed_mode: bool = False):
        import jax.numpy as jnp

        self.root = root
        self.dtype = dtype if dtype is not None else jnp.float64
        self.log = log or (lambda *a: None)
        self.thermo_callback = thermo_callback
        self.speed_mode = speed_mode  # allow f32/neighbor-list fast paths

        self.variables: dict[str, str] = {}
        self._index_values: dict[str, list] = {}
        # equal/atom-style variable EXPRESSIONS (lazy evaluation through
        # lidp_tpu.io.expr — the variable.cpp Variable::evaluate analog)
        self._equal_exprs: dict[str, str] = {}
        self._atom_exprs: dict[str, str] = {}
        self._internal_vars: dict[str, float] = {}
        self._eval_in_progress: set = set()
        self._rng_equal = None       # persistent random() streams
        self._rng_atom = None        # (variable.cpp randomequal/randomatom)
        self._kw_row = None          # current thermo row for keyword eval
        self._run_begin = 0          # update->beginstep/endstep analogs
        self._run_end = 0
        self._in_run = False
        self._skip_next_jump = False
        self.units = units_mod.LJ
        self.dt: float = self.units.dt
        self.skin: float = self.units.skin
        self.atom_style = "atomic"
        self.dimension = 3
        self.boundary = "p p p"
        self.boundary_styles = [("p", "p")] * 3   # per-dim (lo, hi) faces
        self._created_box = None     # (lo, hi) pre-expansion, for 'm' minima
        self.neigh_exclude_types = []   # [(t1, t2), ...]
        self.neigh_exclude_mol = False  # exclude molecule all
        self._thermo_temp = None        # thermo_modify temp COMPUTE-ID
        self.data = None             # DataFile
        self.lattice_style = None
        self.lattice_spacing = 0.0
        self.regions: dict[str, tuple] = {}
        self.box_lo = None
        self.box_hi = None
        self.x = None                # (N,3) numpy
        self.v = None
        self.q = None
        self.type = None
        self.mol = None
        self.image = None
        self.ntypes = 0
        self.mass_type = None        # (T+1,)
        self.alpha_type = None       # (T+1,)
        self.pair = PairStyleSpec()
        self.pair_coeffs: dict[tuple, tuple] = {}
        self.kspace: Optional[tuple] = None      # (style, accuracy)
        # index 0 = factor for non-special pairs, always 1.0 (force.h special_lj)
        self.special_lj = [1.0, 0.0, 0.0, 0.0]
        self.special_coul = [1.0, 0.0, 0.0, 0.0]
        self.groups: dict[str, np.ndarray] = {}
        self.computes: dict[str, tuple] = {}
        self.fixes: dict[str, FixSpec] = {}
        self.dumps: dict[str, DumpSpec] = {}
        self.thermo_every = 0
        self.thermo_columns = ["step", "temp", "epair", "emol", "etotal", "press"]
        self.neigh_every = 1
        self.neigh_delay = 10
        self.neigh_check = True
        self.step = 0
        self.thermo_rows: list[dict] = []
        self._sim = None             # live Simulation between run commands
        self.eam_file = None
        self.eam_type_elems = None   # eam/alloy: element name per type
        self.bond_style = None
        self.bond_style_args = []
        self.bond_coeffs = {}
        self.angle_style = None
        self.angle_style_args = []
        self.angle_coeffs = {}
        self.dihedral_style = None
        self.dihedral_style_args = []
        self.dihedral_coeffs = {}
        self.improper_style = None
        self.improper_style_args = []
        self.improper_coeffs = {}
        self._pair_shift = False     # pair_modify shift
        self._pair_mix = "geometric"  # pair_modify mix
        self._gewald_override = None  # kspace_modify gewald
        # `processors` analog: shard the engine over this many devices
        # (GSPMD atom-axis sharding; 0/1 = single-device fast path)
        self.n_shard_devices = 0
        # weighted-balance row permutation (cmd_balance), or None
        self.shard_perm = None

    # ------------------------------ parsing ------------------------------

    def file(self, path: str):
        self.root = os.path.dirname(os.path.abspath(path))
        with open(path) as fh:
            self.execute(fh.readlines())

    def execute(self, lines):
        """Run a command list with control flow (label/jump/next/if —
        Input::file + jump/next/label commands, input.cpp).  Lines ending
        in '&' continue onto the next line (Input::parse)."""
        merged, buf = [], ""
        for line in lines:
            body = line.split("#", 1)[0].rstrip()
            if body.endswith("&"):
                buf += body[:-1] + " "
                continue
            merged.append(buf + line)
            buf = ""
        if buf:
            merged.append(buf)
        lines = merged
        pc = 0
        self._skip_next_jump = False
        while pc < len(lines):
            line = lines[pc]
            stripped = line.split("#", 1)[0].strip()
            toks = stripped.split()
            if toks and toks[0] == "label":
                pc += 1
                continue
            if toks and toks[0] == "jump":
                if self._skip_next_jump:
                    self._skip_next_jump = False
                    pc += 1
                    continue
                target = toks[2] if len(toks) > 2 else None
                if toks[1] not in ("SELF",):
                    raise ValueError("jump supports SELF only")
                pc = self._find_label(lines, target)
                continue
            if toks and toks[0] == "next":
                name = toks[1]
                seq = self._index_values.get(name)
                if seq is not None and self.variables.get(name) in seq[:-1]:
                    i = seq.index(self.variables[name])
                    self.variables[name] = seq[i + 1]
                else:
                    self.variables.pop(name, None)
                    self._index_values.pop(name, None)
                    self._skip_next_jump = True
                pc += 1
                continue
            self.one(line)
            pc += 1

    def _find_label(self, lines, target):
        for i, line in enumerate(lines):
            toks = line.split("#", 1)[0].split()
            if len(toks) >= 2 and toks[0] == "label" and toks[1] == target:
                return i
        raise ValueError(f"label {target} not found")

    def one(self, line: str):
        line = line.split("#", 1)[0].strip()
        if not line:
            return
        line = self._substitute(line)
        toks = line.split()
        cmd, args = toks[0], toks[1:]
        handler = getattr(self, "cmd_" + cmd, None)
        if handler is None:
            raise ValueError(f"unsupported command: {cmd}")
        handler(args)

    def _substitute(self, line: str) -> str:
        from lidp_tpu.io import expr as expr_mod

        out = []
        i = 0
        while i < len(line):
            c = line[i]
            if c == "$":
                if line[i + 1] == "(":
                    # $(expr) immediate evaluation (Input::substitute)
                    j = expr_mod._find_matching_paren(line, i + 1)
                    text = line[i + 2:j]
                    i = j + 1
                    out.append("%.20g" % self.evaluate_expr(text))
                    continue
                if line[i + 1] == "{":
                    j = line.index("}", i)
                    name = line[i + 2:j]
                    i = j + 1
                else:
                    name = line[i + 1]
                    i += 2
                s = self.var_str(name)
                if s is not None:
                    out.append(s)
                else:
                    # leave unknown ${name} for runtime substitution
                    # (fix print messages reference thermo keywords)
                    out.append("${%s}" % name if len(name) > 1
                               else "$" + name)
            else:
                out.append(c)
                i += 1
        return "".join(out)

    # ------------------------- variable engine --------------------------

    def var_str(self, name) -> Optional[str]:
        """Variable::retrieve analog: the substitution string for $name —
        equal/internal styles evaluate NOW and format %.15g
        (variable.cpp:856)."""
        if name in self._equal_exprs:
            return "%.15g" % self.var_value(name)
        if name in self._internal_vars:
            return "%.15g" % self._internal_vars[name]
        if name in self.variables:
            return self.variables[name]
        return None

    def var_value(self, name) -> float:
        """Numeric value of a variable (equal/internal evaluated lazily;
        index/loop/string parsed as numbers)."""
        if name in self._internal_vars:
            return self._internal_vars[name]
        if name in self._equal_exprs:
            if name in self._eval_in_progress:
                raise ValueError(
                    f"variable {name} has a circular dependency")
            self._eval_in_progress.add(name)
            try:
                return self.evaluate_expr(self._equal_exprs[name])
            finally:
                self._eval_in_progress.discard(name)
        if name in self.variables:
            return float(self.variables[name])
        raise KeyError(f"variable {name} is not defined")

    def evaluate_expr(self, text: str) -> float:
        from lidp_tpu.io import expr as expr_mod

        return expr_mod.evaluate(_ExprCtx(self), text)

    def evaluate_atom_expr(self, text: str) -> np.ndarray:
        from lidp_tpu.io import expr as expr_mod

        return expr_mod.evaluate_atom(_ExprCtx(self), text)

    def _thermo_keyword(self, word):
        """Thermo::evaluate_keyword analog for expressions.  State
        keywords come from the live Simulation's thermo row (cached in
        _kw_row while one is being assembled); geometry/config keywords
        are served directly."""
        if self._kw_row is not None and word in self._kw_row:
            v = self._kw_row[word]
            if isinstance(v, (int, float)):
                return float(v)
        if word == "step":
            return float(self.step)
        if word == "dt":
            return float(self.dt)
        if word == "time":
            return float(self.step) * float(self.dt)
        if word == "elapsed" or word == "elaplong":
            return float(self.step - self._run_begin)
        if word == "atoms":
            return float(len(self.x) if self.x is not None else 0)
        if word in ("cpu", "tpcpu", "spcpu", "cpuremain", "part",
                    "timeremain"):
            return 0.0
        if self.box_lo is not None:
            lo, hi = self.box_lo, self.box_hi
            L = hi - lo
            geom = {"lx": L[0], "ly": L[1], "lz": L[2],
                    "xlo": lo[0], "xhi": hi[0], "ylo": lo[1],
                    "yhi": hi[1], "zlo": lo[2], "zhi": hi[2],
                    "vol": L[0] * L[1] * L[2],
                    "cella": L[0], "cellb": L[1], "cellc": L[2],
                    "cellalpha": 90.0, "cellbeta": 90.0,
                    "cellgamma": 90.0}
            tilt = getattr(self, "box_tilt", None)
            geom["xy"] = tilt[0] if tilt is not None else 0.0
            geom["xz"] = tilt[1] if tilt is not None else 0.0
            geom["yz"] = tilt[2] if tilt is not None else 0.0
            if word in geom:
                return float(geom[word])
            if word == "density":
                mass = float(self.mass_type[self.type].sum())
                vol = float(L[0] * L[1] * L[2])
                u = self.units
                return u.mv2d * mass / vol if hasattr(u, "mv2d") \
                    else mass / vol
        if word in ("xlat", "ylat", "zlat"):
            s3 = self._spacing3()
            return float(s3["xyz".index(word[0])])
        if word in ("bonds", "angles", "dihedrals", "impropers"):
            t_ = getattr(self, "_" + word, None)
            return 0.0 if t_ is None else float(len(t_))
        # state keywords (temp/press/pe/...) need a force evaluation:
        # build a thermo row from the live Simulation
        row = self._current_thermo_row()
        if row is not None and word in row:
            v = row[word]
            if isinstance(v, (int, float)):
                return float(v)
        return None

    def _current_thermo_row(self):
        """Thermo row for the CURRENT state (between runs this is the
        last force evaluation — same staleness as the reference)."""
        if self._kw_row is not None:
            return self._kw_row
        if self._sim is not None and self._sim.res is not None:
            row = self._sim._thermo_row()
            return row
        return None

    # ----------------------------- commands ------------------------------

    def cmd_print(self, a):
        self.log(" ".join(a).strip('"'))

    def cmd_include(self, a):
        path = os.path.join(self.root, a[0])
        with open(path) as fh:
            self.execute(fh.readlines())

    def cmd_if(self, a):
        """if "cond" then "cmd"... [elif "cond" "cmd"...]* [else "cmd"...]
        (input.cpp:905-1010; conditions through the Boolean evaluator,
        variable.cpp:4629 — no Python eval)."""
        import shlex

        from lidp_tpu.io import expr as expr_mod

        toks = shlex.split(" ".join(a))
        # split into branches: [(cond, [cmds]), ...], else = cond None
        if "then" not in toks:
            raise ValueError("if command needs 'then'")
        branches = []
        cond = toks[0]
        cmds = []
        i = toks.index("then") + 1
        while i < len(toks):
            t = toks[i]
            if t == "elif":
                branches.append((cond, cmds))
                cond, cmds = toks[i + 1], []
                i += 2
                continue
            if t == "else":
                branches.append((cond, cmds))
                cond, cmds = None, []
                i += 1
                continue
            cmds.append(t)
            i += 1
        branches.append((cond, cmds))
        for cond, cmds in branches:
            if cond is None or expr_mod.evaluate_boolean(cond) != 0.0:
                for c in cmds:
                    self.one(c)
                return

    def cmd_variable(self, a):
        name, style = a[0], a[1]
        if not hasattr(self, "_index_values"):
            self._index_values = {}
        if style == "index":
            if name not in self.variables:
                self.variables[name] = a[2]
                self._index_values[name] = list(a[2:])
        elif style == "loop":
            if name not in self.variables:
                vals = [str(i) for i in range(1, int(a[2]) + 1)]
                self.variables[name] = vals[0]
                self._index_values[name] = vals
        elif style == "delete":
            # variable NAME delete (variable.cpp:314)
            for d in (self.variables, self._index_values,
                      self._equal_exprs, self._atom_exprs,
                      self._internal_vars):
                d.pop(name, None)
        elif style == "equal":
            # store the EXPRESSION; evaluation is lazy (Variable::retrieve
            # / compute_equal) so thermo keywords and v_/c_/f_ refs see
            # the state at USE time.  Redefinition replaces (variable.cpp
            # :259-264).
            expr = " ".join(a[2:]).strip()
            if (expr.startswith('"') and expr.endswith('"')) or (
                    expr.startswith("'") and expr.endswith("'")):
                expr = expr[1:-1]
            self._equal_exprs[name] = expr
            self.variables.pop(name, None)
            m_ramp = _RAMP_RE.match(expr)
            if m_ramp:
                # constant-arg ramp(lo,hi) also feeds the traced fix
                # adapt path (which needs the bounds at build time)
                if not hasattr(self, "_ramp_vars"):
                    self._ramp_vars = {}
                self._ramp_vars[name] = (float(m_ramp.group(1)),
                                         float(m_ramp.group(2)))
        elif style == "atom":
            expr = " ".join(a[2:]).strip()
            if (expr.startswith('"') and expr.endswith('"')) or (
                    expr.startswith("'") and expr.endswith("'")):
                expr = expr[1:-1]
            self._atom_exprs[name] = expr
        elif style == "string":
            self.variables[name] = a[2]
        elif style == "internal":
            # numeric value settable by code (variable.cpp INTERNAL;
            # consumed by fix controller)
            self._internal_vars[name] = float(a[2])
        elif style == "world":
            # one value per partition (variable.cpp WORLD); single-process
            # emulation keeps the full list (used by `temper`) and
            # substitutes world 0's value
            if not hasattr(self, "_world_vars"):
                self._world_vars = {}
            self._world_vars[name] = list(a[2:])
            self.variables[name] = a[2]
        else:
            raise ValueError(f"unsupported variable style {style}")

    def cmd_units(self, a):
        self.units = units_mod.get(a[0])
        self.dt = self.units.dt        # units resets dt (update.cpp:147 etc.)
        self.skin = self.units.skin

    def cmd_timestep(self, a):
        self.dt = float(a[0])

    def cmd_boundary(self, a):
        # boundary X Y Z with X in {p, f, s, m} or two-letter per-face combos
        # (domain.cpp:418-460); p must apply to both faces of a dim
        self.boundary = " ".join(a)
        styles = []
        for tok in a[:3]:
            tok = tok if len(tok) == 2 else tok + tok
            for c in tok:
                if c not in "pfsm":
                    raise ValueError(f"illegal boundary style {tok!r}")
            if ("p" in tok) and tok != "pp":
                raise ValueError("both faces of a dim must be periodic")
            styles.append((tok[0], tok[1]))
        while len(styles) < 3:
            styles.append(("p", "p"))
        self.boundary_styles = styles

    @property
    def periodic(self):
        return tuple(st == ("p", "p") for st in self.boundary_styles)

    def _apply_initial_box(self):
        """Domain::set_initial_box (domain.cpp:204-224): freeze small =
        1e-4 * created length, expand 's' faces outward by small and record
        'm' minima at the created faces."""
        self._created_box = (self.box_lo.copy(), self.box_hi.copy())
        small = 1.0e-4 * (self.box_hi - self.box_lo)
        for d, (lo_s, hi_s) in enumerate(self.boundary_styles):
            if lo_s == "s":
                self.box_lo[d] -= small[d]
            if hi_s == "s":
                self.box_hi[d] += small[d]

    def cmd_atom_style(self, a):
        self.atom_style = a[0]

    def cmd_dimension(self, a):
        self.dimension = int(a[0])
        if self.dimension not in (2, 3):
            raise ValueError("dimension must be 2 or 3")

    def cmd_processors(self, a):
        pass

    def cmd_atom_modify(self, a):
        # atom_modify map array|hash / sort N cutoff (atom.cpp modify
        # settings): global-ID lookup is an O(1) array index in the
        # fixed-capacity SoA store by construction; sorting is the cell
        # binning's concern — nothing to configure
        pass

    def cmd_log(self, a):
        pass

    def cmd_echo(self, a):
        pass

    def cmd_newton(self, a):
        # Newton's third law across procs (newton off in bench/in.chute):
        # single-image TPU engine — half-stencil tallies both sides either
        # way, physics identical
        pass

    def cmd_comm_modify(self, a):
        # ghost-atom communication options (comm_modify vel yes): no ghost
        # layer here — sharded paths replicate/psum instead
        pass

    def cmd_neighbor(self, a):
        self.skin = float(a[0])

    def cmd_neigh_modify(self, a):
        i = 0
        while i < len(a):
            k = a[i]
            if k == "every":
                self.neigh_every = int(a[i + 1]); i += 2
            elif k == "delay":
                self.neigh_delay = int(a[i + 1]); i += 2
            elif k == "check":
                self.neigh_check = _yesno(a[i + 1]); i += 2
            elif k == "exclude":
                if a[i + 1] in ("molecule", "molecule/intra"):
                    # exclude molecule GROUP: drop same-molecule pairs
                    # (renamed molecule/intra in 2018, neighbor.cpp:2305)
                    if a[i + 2] != "all":
                        raise NotImplementedError(
                            "exclude molecule on sub-groups")
                    self.neigh_exclude_mol = True
                    self._invalidate()
                    i += 3
                elif a[i + 1] == "group":
                    # exclude group A B: drop pairs with one atom in each
                    # group (in.chute: bottom bottom)
                    if a[i + 2] != a[i + 3]:
                        raise NotImplementedError(
                            "exclude group supports A == B only")
                    self.neigh_exclude_group = a[i + 2]
                    self._invalidate()
                    i += 4
                elif a[i + 1] == "type":
                    # neighbor.cpp exclusion lists: drop all pairs between
                    # these two types from force evaluation
                    self.neigh_exclude_types.append(
                        (int(a[i + 2]), int(a[i + 3])))
                    self._invalidate()
                    i += 4
                else:
                    raise ValueError(
                        f"unsupported neigh_modify exclude {a[i + 1]}")
            else:
                i += 2

    def cmd_lattice(self, a):
        self.lattice_style = a[0]
        self.lattice_spacing3 = lattice_mod.lattice_spacing3(
            a[0], float(a[1]), self.units.name, dim=self.dimension)
        self.lattice_spacing = float(self.lattice_spacing3[0])
        self.log("Lattice spacing in x,y,z = %g %g %g" % tuple(
            self.lattice_spacing3))

    def cmd_region(self, a):
        # region ID style args... [side in|out] [units lattice|box]
        # (region.cpp options + region_{block,sphere,prism,cylinder,
        # cone,plane,union,intersect}.cpp)
        name, style = a[0], a[1]
        nargs = {"block": 6, "sphere": 4, "prism": 9, "cylinder": 6,
                 "cone": 7, "plane": 6}
        if style in ("union", "intersect"):
            cnt = int(a[2])
            subs = a[3:3 + cnt]
            tail = a[3 + cnt:]
            self.regions[name] = (style,) + tuple(subs)
        elif style in nargs:
            k = nargs[style]
            toks = a[2:2 + k]
            if style in ("cylinder", "cone"):
                vals = [toks[0]] + [float(v) for v in toks[1:]]
            else:
                vals = [float(v) for v in toks]
            tail = a[2 + k:]
            if style == "block":
                self.regions[name] = tuple(vals)    # legacy 6-tuple
            else:
                self.regions[name] = (style,) + tuple(vals)
        else:
            raise ValueError(f"unsupported region style {style}")
        kw = {"side": "in", "units": "lattice"}
        i = 0
        while i < len(tail):
            if tail[i] in ("side", "units"):
                kw[tail[i]] = tail[i + 1]
                i += 2
            else:
                i += 1
        if not hasattr(self, "_region_kw"):
            self._region_kw = {}
        self._region_kw[name] = kw

    def _region_spacing(self, name):
        kw = getattr(self, "_region_kw", {}).get(
            name, {"units": "lattice"})
        return (np.ones(3) if kw.get("units") == "box"
                else self._spacing3())

    def _region_mask(self, name, x=None):
        """Boolean membership of atoms in a region (honoring side
        in/out; union/intersect recurse into their sub-regions).  x
        overrides the script's host coordinates — runtime samplers pass
        the CURRENT wrapped positions (Region::match sees atom->x)."""
        r = self.regions[name]
        s3 = self._region_spacing(name)
        if x is None:
            x = self.x
        n = x.shape[0]
        kw = getattr(self, "_region_kw", {}).get(name, {})
        if not (isinstance(r[0], str)):
            lo_hi = np.asarray(r, float) * np.repeat(s3, 2)
            sel = np.ones(n, bool)
            for d in range(3):
                lo_b, hi_b = lo_hi[2 * d], lo_hi[2 * d + 1]
                if np.isinf(lo_b):
                    lo_b = -np.inf
                sel &= (x[:, d] >= lo_b) & (x[:, d] <= hi_b)
        elif r[0] == "sphere":
            c = np.array(r[1:4]) * s3
            rad = r[4] * s3[0]
            d = x - c
            sel = np.sum(d * d, axis=1) <= rad * rad
        elif r[0] == "cylinder":
            # region_cylinder.cpp: axis dim, c1/c2 in the two other dims
            dim = {"x": 0, "y": 1, "z": 2}[r[1]]
            d1, d2 = [d for d in range(3) if d != dim]
            c1, c2 = r[2] * s3[d1], r[3] * s3[d2]
            rad = r[4] * s3[(dim + 1) % 3]
            lo, hi = r[5] * s3[dim], r[6] * s3[dim]
            if np.isinf(lo):
                lo = -np.inf        # INF on the low bound extends down
            dd = ((x[:, d1] - c1) ** 2 + (x[:, d2] - c2) ** 2)
            sel = ((dd <= rad * rad) & (x[:, dim] >= lo)
                   & (x[:, dim] <= hi))
        elif r[0] == "cone":
            # region_cone.cpp: radius interpolates radlo->radhi along dim
            dim = {"x": 0, "y": 1, "z": 2}[r[1]]
            d1, d2 = [d for d in range(3) if d != dim]
            c1, c2 = r[2] * s3[d1], r[3] * s3[d2]
            rlo_, rhi_ = r[4] * s3[(dim + 1) % 3], r[5] * s3[(dim + 1) % 3]
            lo, hi = r[6] * s3[dim], r[7] * s3[dim]
            if np.isinf(lo):
                lo = -np.inf
            t = np.clip((x[:, dim] - lo) / max(hi - lo, 1e-300),
                        0.0, 1.0)
            rad = rlo_ + t * (rhi_ - rlo_)
            dd = ((x[:, d1] - c1) ** 2 + (x[:, d2] - c2) ** 2)
            sel = ((dd <= rad * rad) & (x[:, dim] >= lo)
                   & (x[:, dim] <= hi))
        elif r[0] == "plane":
            # region_plane.cpp: inside = the side the normal points to
            p = np.array(r[1:4]) * s3
            nvec = np.array(r[4:7])
            sel = (x - p) @ nvec >= 0.0
        elif r[0] == "union":
            sel = np.zeros(n, bool)
            for sub in r[1:]:
                sel |= self._region_mask(sub, x=x)
        elif r[0] == "intersect":
            sel = np.ones(n, bool)
            for sub in r[1:]:
                sel &= self._region_mask(sub, x=x)
        else:
            raise ValueError(f"region {name}: no membership test for "
                             f"{r[0]}")
        if kw.get("side", "in") == "out":
            sel = ~sel
        return sel

    def cmd_create_box(self, a):
        self.ntypes = int(a[0])
        lo_hi = self.regions[a[1]]
        s3 = self._spacing3()
        if isinstance(lo_hi[0], str) and lo_hi[0] == "prism":
            # region prism xlo xhi ylo yhi zlo zhi xy xz yz -> triclinic
            # box (create_box.cpp:66-79; xy/xz scale by xlattice, yz by
            # ylattice per region_prism.cpp:52-60)
            b = lo_hi[1:]
            self.box_lo = np.array([b[0], b[2], b[4]]) * s3
            self.box_hi = np.array([b[1], b[3], b[5]]) * s3
            self.box_tilt = np.array([b[6] * s3[0], b[7] * s3[0],
                                      b[8] * s3[1]])
        else:
            self.box_lo = np.array([lo_hi[0], lo_hi[2], lo_hi[4]]) * s3
            self.box_hi = np.array([lo_hi[1], lo_hi[3], lo_hi[5]]) * s3
        self._apply_initial_box()
        self.mass_type = np.zeros(self.ntypes + 1)
        self.alpha_type = np.zeros(self.ntypes + 1)

    def cmd_create_atoms(self, a):
        """create_atoms type box|region ID|single x y z|random N seed ID
        (create_atoms.cpp styles BOX/REGION/SINGLE/RANDOM)."""
        ty = int(a[0])
        if a[1] in ("box", "region"):
            x = lattice_mod.create_atoms_bounds(
                self.lattice_style, self._spacing3(), self.box_lo,
                self.box_hi)
            if a[1] == "region":
                x = x[self._region_mask(a[2], x=x)]
            if self.dimension == 2:
                x = x[np.abs(x[:, 2]) < 1e-12]
                x[:, 2] = 0.0   # 2d atoms live on the z=0 plane
        elif a[1] == "single":
            # units box|lattice (create_atoms.cpp:160: default lattice)
            s3 = (np.ones(3) if "units" in a
                  and a[a.index("units") + 1] == "box"
                  else self._spacing3())
            x = np.array([[float(a[2]) * s3[0], float(a[3]) * s3[1],
                           float(a[4]) * s3[2]]])
        elif a[1] == "random":
            # uniform draws from one RanPark stream (create_atoms.cpp:436)
            from lidp_tpu.rng import RanPark

            nrand, seed = int(a[2]), int(a[3])
            lo = self.box_lo.copy()
            hi = self.box_hi.copy()
            rng_ = RanPark(seed)
            pts = []
            while len(pts) < nrand:
                p = np.array([lo[0] + rng_.uniform() * (hi[0] - lo[0]),
                              lo[1] + rng_.uniform() * (hi[1] - lo[1]),
                              lo[2] + rng_.uniform() * (hi[2] - lo[2])])
                if self.dimension == 2:
                    p[2] = 0.0
                if a[4] != "NULL" and not self._region_mask(
                        a[4], x=p[None, :])[0]:
                    continue
                pts.append(p)
            x = np.asarray(pts)
        else:
            raise NotImplementedError(f"create_atoms {a[1]}")
        if "mol" in a:
            # create_atoms N ... mol template-ID seed: one randomly
            # rotated molecule per site (create_atoms.cpp:133-229)
            im = a.index("mol")
            self._insert_molecules(x, ty, a[im + 1], int(a[im + 2]))
            return
        self.log(f"Created {x.shape[0]} atoms")
        nnew = x.shape[0]
        if self.x is not None and len(self.x) and a[1] != "box":
            # append to the existing system (multiple create_atoms calls)
            self.x = np.concatenate([self.x, x])
            self.v = np.concatenate([self.v, np.zeros((nnew, 3))])
            self.q = np.concatenate([self.q, np.zeros(nnew)])
            self.type = np.concatenate(
                [self.type, np.full(nnew, ty, np.int32)])
            self.mol = np.concatenate(
                [self.mol, np.zeros(nnew, np.int32)])
            self.image = np.concatenate(
                [self.image, np.zeros((nnew, 3), np.int32)])
            n = len(self.x)
            self.groups = {k: (np.concatenate(
                [np.asarray(v), np.full(nnew, k == "all", bool)]))
                for k, v in self.groups.items()}
            return
        n = nnew
        self.x = x
        self.v = np.zeros((n, 3))
        self.q = np.zeros(n)
        self.type = np.full(n, ty, np.int32)
        self.mol = np.zeros(n, np.int32)
        self.image = np.zeros((n, 3), np.int32)
        self._bonds = np.zeros((0, 2), np.int64)
        self.groups["all"] = np.ones(n, bool)

    def cmd_read_data(self, a):
        path = os.path.join(self.root, a[0])
        # trailing `fix ID header-keyword section-keyword` tokens
        # (read_data.cpp fix option) route extra sections to a fix; the
        # reader auto-detects the CMAP section, so they need no action
        d = read_data(path, atom_style=self.atom_style)
        if d.crossterms is not None:
            self._crossterms = d.crossterms
        self.data = d
        self.ntypes = d.ntypes
        self.box_lo, self.box_hi = d.box_lo, d.box_hi
        self.box_tilt = d.tilt if d.tilt is not None else np.zeros(3)
        self.x, self.q = d.x, d.q
        self.type, self.mol, self.image = d.type, d.mol, d.image
        self.v = d.v if d.v is not None else np.zeros_like(d.x)
        if d.radius is not None:      # atom_style sphere
            self.radius, self.rmass, self.omega = d.radius, d.rmass, d.omega
        self.mass_type = d.mass if d.mass is not None else np.zeros(d.ntypes + 1)
        self.alpha_type = np.zeros(d.ntypes + 1)
        self._bonds = d.bonds
        self._bond_types = d.bond_types
        self.nbondtypes = d.nbondtypes
        self._angles = d.angles
        self._angle_types = d.angle_types
        self._dihedrals = d.dihedrals
        self._dihedral_types = d.dihedral_types
        self._impropers = d.impropers
        self._improper_types = d.improper_types
        self.groups["all"] = np.ones(d.natoms, bool)
        # coeff sections embedded in the data file (read_data.cpp):
        # Pair Coeffs rows are per-type i==j; CHARMM styles carry
        # eps14/sigma14 as columns 3-4
        if d.pair_coeffs:
            for t, vals in d.pair_coeffs.items():
                self.pair_coeffs[(t, t)] = (vals[0], vals[1],
                                            self.pair.cut_lj_global)
                if len(vals) >= 4 and "charmm" in self.pair.name:
                    if not hasattr(self, "pair_coeffs14"):
                        self.pair_coeffs14 = {}
                    self.pair_coeffs14[(t, t)] = (vals[2], vals[3])
        if d.bond_coeffs:
            self.bond_coeffs.update(d.bond_coeffs)
        if d.angle_coeffs:
            self.angle_coeffs.update(d.angle_coeffs)
        if d.dihedral_coeffs:
            self.dihedral_coeffs.update(d.dihedral_coeffs)
        if d.improper_coeffs:
            self.improper_coeffs.update(d.improper_coeffs)

    def cmd_replicate(self, a):
        """Replicate the system nx x ny x nz (replicate.cpp semantics:
        positions shifted by box vectors, molecule ids offset per replica)."""
        nx, ny, nz = int(a[0]), int(a[1]), int(a[2])
        if min(nx, ny, nz) < 1:
            raise ValueError("Illegal replicate command: factors must be >= 1")
        L = self.box_hi - self.box_lo
        n0 = self.x.shape[0]
        maxmol = int(self.mol.max()) if self.mol.size else 0
        # replicate.cpp:189-225: each atom is UNMAPPED through its image
        # flags before shifting, then remapped into the NEW box — bonded
        # pairs wrapped across an old-box face would otherwise land a
        # full old-box length apart in the enlarged box (min-image over
        # the new box no longer folds them together)
        xu = self.x + self.image * L
        new_L = L * np.array([nx, ny, nz])
        xs, vs, qs, ts, ms, ims = [], [], [], [], [], []
        bonds = []
        rep = 0
        for iz in range(nz):
            for iy in range(ny):
                for ix in range(nx):
                    shift = np.array([ix, iy, iz]) * L
                    xr = xu + shift
                    # keep positions UNWRAPPED (image 0): the engine's
                    # convention everywhere is raw coordinates (read_data
                    # keeps atoms outside the box as-is; rigid-body COM
                    # and SHAKE clusters rely on molecule contiguity;
                    # pair/kspace paths fold by minimum image or wrap at
                    # neighbor setup).  Rewrapping into the enlarged box
                    # here split molecules that stick out of the data's
                    # box — a sorbate at z < zlo landed a full old-box
                    # length away from its body, and fix rigid/nve then
                    # snapped it across the cell on the first set_xv
                    # (found via the replicated MOF5+Methane benchmark).
                    xs.append(xr)
                    vs.append(self.v)
                    qs.append(self.q)
                    ts.append(self.type)
                    ms.append(np.where(self.mol > 0, self.mol + rep * maxmol, 0))
                    ims.append(np.zeros_like(self.image))
                    if getattr(self, "_bonds", None) is not None and len(self._bonds):
                        bonds.append(self._bonds + rep * n0)
                    rep += 1
        self.x = np.concatenate(xs)
        self.v = np.concatenate(vs)
        self.q = np.concatenate(qs)
        self.type = np.concatenate(ts).astype(np.int32)
        self.mol = np.concatenate(ms).astype(np.int32)
        self.image = np.concatenate(ims)
        self._bonds = (np.concatenate(bonds) if bonds
                       else np.zeros((0, 2), np.int64))
        if getattr(self, "_bond_types", None) is not None and len(self._bonds):
            self._bond_types = np.tile(self._bond_types, rep)
        # replicate.cpp copies ALL topology sections with per-replica
        # atom-index offsets, not just bonds
        for sec, tsec in (("_angles", "_angle_types"),
                          ("_dihedrals", "_dihedral_types"),
                          ("_impropers", "_improper_types")):
            arr = getattr(self, sec, None)
            if arr is not None and len(arr):
                setattr(self, sec, np.concatenate(
                    [arr + r * n0 for r in range(rep)]))
                tarr = getattr(self, tsec, None)
                if tarr is not None:
                    setattr(self, tsec, np.tile(tarr, rep))
        self.box_hi = self.box_lo + L * np.array([nx, ny, nz])
        self.groups = {"all": np.ones(self.x.shape[0], bool)}
        self._invalidate()

    def cmd_processors(self, a):
        """processors Px Py Pz — the MPI rank-grid command (comm.cpp
        set_proc_grid).  TPU analog: the product selects the device-mesh
        size for GSPMD atom-axis sharding ('*' counts as 1)."""
        total = 1
        for tok in a[:3]:
            if tok != "*":
                total *= int(tok)
        self.n_shard_devices = total
        self._invalidate()


    def _invalidate(self):
        """Adopt the live Simulation's evolved state (positions, velocities,
        images, box) into the host arrays, then drop it — any configuration
        change rebuilds the jitted Simulation from the host arrays, which
        must reflect the last run (LAMMPS mutates one Atom store in place;
        sequential-run scripts like micelle's soft->lj/cut switch rely on
        this)."""
        sim = self._sim
        self._sim = None
        if sim is None or sim.res is None:
            return
        n = sim.natoms
        self.x = np.asarray(sim.sys.x)[:n].copy()
        self.v = np.asarray(sim.sys.v)[:n].copy()
        self.image = np.asarray(sim.sys.image)[:n].copy()
        self.box_lo = np.asarray(sim.sys.box.lo).copy()
        self.box_hi = np.asarray(sim.sys.box.hi).copy()

    def _spacing3(self):
        s3 = getattr(self, "lattice_spacing3", None)
        if s3 is None:
            s3 = np.full(3, self.lattice_spacing or 1.0)
        return np.asarray(s3, float)

    def cmd_mass(self, a):
        # mass {type|wildcard} value (mass.cpp via utils::bounds:
        # *, n*, *n, n*m all select type ranges)
        tok = str(a[0])
        if "*" in tok:
            lo, _, hi = tok.partition("*")
            lo = int(lo) if lo else 1
            hi = int(hi) if hi else self.ntypes
            for t in range(lo, hi + 1):
                self.mass_type[t] = float(a[1])
        else:
            self.mass_type[int(tok)] = float(a[1])

    def cmd_set(self, a):
        self._invalidate()
        if a[0] == "type" and a[2] == "static_polarizability":
            val = float(a[3])
            if val < 0:
                raise ValueError("static_polarizability must be >= 0 (set.cpp:178)")
            self.alpha_type[int(a[1])] = val
        elif a[2] == "type/fraction":
            # set type|group X type/fraction newtype frac seed — set.cpp:947:
            # per-atom RanPark reset from (seed, coords) geometry hash, then
            # one uniform; <= fraction switches the type
            from lidp_tpu.rng import park_geom_streams

            newtype, frac, seed = int(a[3]), float(a[4]), int(a[5])
            if a[0] == "type":
                select = self.type == int(a[1])
            elif a[0] == "group":
                select = self.groups[a[1]].copy()
            else:
                raise ValueError(f"unsupported set selector {a[0]}")
            streams = park_geom_streams(seed, self.x)
            hit = select & (streams.uniform() <= frac)
            self.type = np.where(hit, newtype, self.type)
            self._invalidate()
        elif a[2] == "type" and len(a) == 4:
            # set group|type|region X type N (set.cpp TYPE keyword)
            sel = self._set_selector(a[0], a[1])
            self.type = np.where(sel, int(a[3]), self.type)
            self._invalidate()
        elif a[2] == "charge":
            # set group|type|region|atom X charge Q (set.cpp CHARGE)
            sel = self._set_selector(a[0], a[1])
            self.q = np.where(sel, float(a[3]), self.q)
            self._invalidate()
        elif a[2] == "mol":
            sel = self._set_selector(a[0], a[1])
            self.mol = np.where(sel, int(a[3]), self.mol)
            self._invalidate()
        else:
            raise ValueError(f"unsupported set command: {a}")

    def _set_selector(self, style, ident):
        """set.cpp selection styles: atom (id range), type, group, region."""
        n = len(self.x)
        if style == "group":
            return self.groups[ident].copy()
        if style == "type":
            return self.type == int(ident)
        if style == "region":
            return self._region_mask(ident)
        if style == "atom":
            ids = np.arange(1, n + 1)
            if "*" in ident:
                lo, _, hi = ident.partition("*")
                m = np.ones(n, bool)
                if lo:
                    m &= ids >= int(lo)
                if hi:
                    m &= ids <= int(hi)
                return m
            return ids == int(ident)
        raise ValueError(f"unsupported set selector {style}")

    # every style cmd_pair_style accepts — the hybrid parser splits its
    # argument list at tokens that name a sub-style (PairHybrid::settings,
    # pair_hybrid.cpp: "if the word is a pair style name, it starts a new
    # sub-style")
    KNOWN_PAIR_STYLES = frozenset((
        "lj/cut", "lj/cut/coul/cut", "lj/cut/coul/long",
        "lj/cut/coul/long/polarization", "lj/cut/coul/debye",
        "lj/cut/coul/msm", "lj/cut/coul/dsf", "lj/cut/coul/wolf",
        "lj/charmm/coul/long", "lj/charmm/coul/charmm",
        "lj/charmm/coul/charmm/implicit", "lj/charmm/coul/msm",
        "lj/charmmfsw/coul/long", "lj/charmmfsw/coul/charmmfsh",
        "lj/gromacs/coul/gromacs",
        "lj/long/coul/long", "lj/cut/tip4p/long", "lj/cut/tip4p/cut",
        "tip4p/long", "tip4p/cut", "buck/long/coul/long",
        "lj/long/tip4p/long",
        "morse", "buck", "buck/coul/cut", "buck/coul/long", "yukawa",
        "gauss", "soft", "born", "born/coul/long", "born/coul/dsf",
        "born/coul/wolf", "born/coul/msm", "buck/coul/msm",
        "lj/expand", "mie/cut", "lj/gromacs",
        "lj96/cut", "lj/smooth", "lj/smooth/linear", "lj/sf", "beck", "ufm",
        "lj/cubic", "zbl", "zero", "dpd", "dpd/tstat",
        "hbond/dreiding/lj", "hbond/dreiding/morse",
        "coul/cut", "coul/long", "coul/debye", "coul/msm",
        "coul/dsf", "coul/wolf", "table", "eam", "eam/alloy", "eam/fs",
    ))

    # registration aliases: PairStyle(name,Class) headers binding a second
    # name to an existing class (pair_lj_smooth_linear.h:17 lj/sf)
    PAIR_STYLE_ALIASES = {"lj/sf": "lj/smooth/linear"}

    def cmd_pair_style(self, a):
        # mid-script style changes (micelle's soft -> lj/cut) rebuild the
        # simulation from the evolved state
        self._invalidate()
        self.pair_coeffs = {}
        a = [self.PAIR_STYLE_ALIASES.get(a[0], a[0])] + list(a[1:])
        p = PairStyleSpec(name=a[0])
        if a[0] in ("hybrid", "hybrid/overlay"):
            # pair_style hybrid[/overlay] s1 args1 s2 args2 ...
            # (pair_hybrid.cpp::settings); each sub-style's argument
            # segment runs until the next known style name
            subs = []
            i = 1
            while i < len(a):
                name = self.PAIR_STYLE_ALIASES.get(a[i], a[i])
                if name not in self.KNOWN_PAIR_STYLES:
                    raise ValueError(
                        f"unsupported hybrid sub-style {name}")
                i += 1
                args = []
                while i < len(a) and a[i] not in self.KNOWN_PAIR_STYLES:
                    args.append(a[i])
                    i += 1
                subs.append((name, args))
            self.pair_hybrid = subs
            # raw (i_tok, j_tok, coeff tokens) per sub-style, re-parsed
            # through the sub-style's own cmd_pair_coeff at build time
            self.hybrid_raw_coeffs = [[] for _ in subs]
            self.pair = p
            return
        if a[0] in ("eam", "eam/alloy", "eam/fs"):
            pass   # per-pair coeff gives the potential file; cutoff from file
        elif a[0].startswith("gran/"):
            # gran/hooke[/history] kn kt gamman gammat xmu dampflag
            # (pair_gran_hooke_history.cpp settings :343)
            self.gran_args = list(a[1:7])
        elif a[0] == "lj/cut":
            p.cut_lj_global = float(a[1])
        elif a[0] == "lj/charmmfsw/coul/charmmfsh":
            # inner outer [cut_coul]
            # (pair_lj_charmmfsw_coul_charmmfsh.cpp settings)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
            p.cut_coul = float(a[3]) if len(a) > 3 else p.cut_lj_global
            self._pair_mix = "arithmetic"
        elif a[0] in ("lj/charmm/coul/long", "lj/charmm/coul/msm",
                      "lj/charmmfsw/coul/long"):
            # inner outer [coul-outer] (pair_lj_charmm_coul_long.cpp settings)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
            p.cut_coul = float(a[3]) if len(a) > 3 else p.cut_lj_global
            self._pair_mix = "arithmetic"   # CHARMM mixes arithmetic
        elif a[0] in ("lj/charmm/coul/charmm",
                      "lj/charmm/coul/charmm/implicit"):
            # inner outer [inner-coul outer-coul]
            # (pair_lj_charmm_coul_charmm.cpp::settings — 2 or 4 args)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
            if len(a) > 4:
                p.cut_coul_inner = float(a[3])
                p.cut_coul = float(a[4])
            else:
                p.cut_coul_inner = p.cut_lj_inner
                p.cut_coul = p.cut_lj_global
            self._pair_mix = "arithmetic"   # CHARMM mixes arithmetic
        elif a[0] == "lj/gromacs/coul/gromacs":
            # inner outer [inner-coul outer-coul]
            # (pair_lj_gromacs_coul_gromacs.cpp::settings)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
            if len(a) > 4:
                p.cut_coul_inner = float(a[3])
                p.cut_coul = float(a[4])
            else:
                p.cut_coul_inner = p.cut_lj_inner
                p.cut_coul = p.cut_lj_global
        elif a[0] in ("lj/cut/coul/long", "lj/cut/coul/long/polarization"):
            p.cut_lj_global = float(a[1])
            p.cut_coul = float(a[2]) if len(a) > 2 and _NUM_RE.match(a[2]) \
                else p.cut_lj_global
            i = 3 if (len(a) > 2 and _NUM_RE.match(a[2])) else 2
            while i < len(a):
                k, v = a[i], a[i + 1]
                if k == "precision":
                    p.polar_precision = float(v)
                elif k == "zodid":
                    if p.polar_gs or p.polar_gs_ranked:
                        raise ValueError(
                            "Zodid doesn't work with polar_gs or polar_gs_ranked")
                    p.zodid = _yesno(v)
                elif k == "fixed_iteration":
                    p.fixed_iteration = _yesno(v)
                elif k == "damp":
                    p.polar_damp = float(v)
                elif k == "max_iterations":
                    p.iterations_max = int(v)
                elif k == "damp_type":
                    p.damping_type = v
                elif k == "polar_gs":
                    if p.polar_gs_ranked:
                        raise ValueError(
                            "polar_gs and polar_gs_ranked are mutually exclusive")
                    p.polar_gs = _yesno(v)
                elif k == "polar_gs_ranked":
                    if p.polar_gs:
                        raise ValueError(
                            "polar_gs and polar_gs_ranked are mutually exclusive")
                    p.polar_gs_ranked = _yesno(v)
                elif k == "polar_gamma":
                    p.polar_gamma = float(v)
                elif k == "debug":
                    p.debug = _yesno(v)
                elif k == "use_previous":
                    p.use_previous = _yesno(v)
                else:
                    raise ValueError(f"Illegal pair_style keyword {k}")
                i += 2
        elif a[0] in ("morse", "buck", "gauss", "soft", "born",
                      "lj/expand", "mie/cut", "lj96/cut",
                      "lj/smooth/linear", "beck", "ufm", "zero"):
            p.cut_lj_global = float(a[1])
        elif a[0].startswith("hbond/dreiding"):
            # pair_style hbond/dreiding/lj|morse ap cut_inner cut_outer
            # angle (pair_hbond_dreiding_lj.cpp::settings :303-311)
            self._hbond_settings = (int(a[1]), float(a[2]), float(a[3]),
                                    float(a[4]))
            self.hbond_coeffs = []
            p.cut_lj_global = float(a[3])
        elif a[0] == "lj/cubic":
            pass   # no settings: cutoffs derive from sigma (lj_cubic.cpp)
        elif a[0] == "dpd":
            # pair_style dpd T cutoff seed (pair_dpd.cpp settings)
            self._dpd = dict(T=float(a[1]), Tstop=float(a[1]),
                             seed=int(a[3]), tstat=False)
            p.cut_lj_global = float(a[2])
        elif a[0] == "dpd/tstat":
            # pair_style dpd/tstat Tstart Tstop cutoff seed
            self._dpd = dict(T=float(a[1]), Tstop=float(a[2]),
                             seed=int(a[4]), tstat=True)
            p.cut_lj_global = float(a[3])
        elif a[0] in ("coul/dsf", "coul/wolf"):
            # pair_style coul/dsf|wolf alpha cut_coul
            # (pair_coul_dsf.cpp:172-176 / pair_coul_wolf.cpp settings)
            self._dsf_alpha = float(a[1])
            p.cut_coul = float(a[2])
        elif a[0] in ("lj/cut/coul/dsf", "lj/cut/coul/wolf",
                      "born/coul/dsf", "born/coul/wolf"):
            # alpha cut_lj [cut_coul] (pair_lj_cut_coul_dsf.cpp settings)
            self._dsf_alpha = float(a[1])
            p.cut_lj_global = float(a[2])
            p.cut_coul = float(a[3]) if len(a) > 3 else p.cut_lj_global
        elif a[0] == "lj/smooth":
            # pair_style lj/smooth inner outer (pair_lj_smooth.cpp settings)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2]) if len(a) > 2 else p.cut_lj_inner
        elif a[0] == "zbl":
            # pair_style zbl inner outer (pair_zbl.cpp:189-200)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
        elif a[0] == "lj/gromacs":
            # pair_style lj/gromacs inner outer (pair_lj_gromacs.cpp settings)
            p.cut_lj_inner = float(a[1])
            p.cut_lj_global = float(a[2])
        elif a[0] in ("born/coul/long", "born/coul/msm", "buck/coul/msm"):
            p.cut_lj_global = float(a[1])
            p.cut_coul = float(a[2]) if len(a) > 2 else p.cut_lj_global
        elif a[0] in ("lj/long/coul/long", "buck/long/coul/long"):
            # pair_style lj/long/coul/long flag_lj flag_coul cutoff [cut_c]
            # (pair_lj_long_coul_long.cpp settings;
            #  pair_buck_long_coul_long.cpp identical grammar) — only the
            # long/long combination (both sums in k-space) is supported
            if a[1] != "long" or a[2] != "long":
                raise NotImplementedError(
                    f"{a[0]}: only 'long long' flags supported")
            p.cut_lj_global = float(a[3])
            p.cut_coul = float(a[4]) if len(a) > 4 else p.cut_lj_global
        elif a[0] == "lj/long/tip4p/long":
            # flag_lj flag_coul otype htype btype atype qdist cut_lj [cut_c]
            # (pair_lj_long_tip4p_long.cpp settings :1436-1470)
            if a[2] != "long":
                raise NotImplementedError(
                    "lj/long/tip4p/long: coulomb flag must be 'long'")
            if a[1] not in ("cut", "long"):
                raise NotImplementedError(
                    "lj/long/tip4p/long: lj flag must be 'cut' or 'long'")
            self._tip4p_lj_long = a[1] == "long"
            p.tip4p = (int(a[3]), int(a[4]), int(a[5]), int(a[6]),
                       float(a[7]))
            p.tip4p_mode = "long"
            p.cut_lj_global = float(a[8])
            p.cut_coul = float(a[9]) if len(a) > 9 else p.cut_lj_global
        elif a[0] == "lj/cut/coul/cut":
            p.cut_lj_global = float(a[1])
            p.cut_coul = float(a[2]) if len(a) > 2 else p.cut_lj_global
        elif a[0] == "lj/cut/coul/debye":
            # pair_style lj/cut/coul/debye kappa cut_lj [cut_coul]
            self._debye_kappa = float(a[1])
            p.cut_lj_global = float(a[2])
            p.cut_coul = float(a[3]) if len(a) > 3 else p.cut_lj_global
        elif a[0] == "coul/debye":
            self._debye_kappa = float(a[1])
            p.cut_coul = float(a[2])
        elif a[0] == "yukawa":
            # pair_style yukawa kappa cut (pair_yukawa.cpp:152-157)
            self._yukawa_kappa = float(a[1])
            p.cut_lj_global = float(a[2])
        elif a[0] in ("buck/coul/cut", "buck/coul/long"):
            p.cut_lj_global = float(a[1])
            p.cut_coul = float(a[2]) if len(a) > 2 else p.cut_lj_global
        elif a[0] in ("coul/cut", "coul/long", "coul/msm"):
            p.cut_coul = float(a[1])
        elif a[0] == "lj/cut/coul/msm":
            # pair_lj_cut_coul_msm.cpp settings: cut_lj [cut_coul]
            p.cut_lj_global = float(a[1])
            p.cut_coul = float(a[2]) if len(a) > 2 else p.cut_lj_global
        elif a[0] in ("lj/cut/tip4p/long", "lj/cut/tip4p/cut"):
            # otype htype btype atype qdist cut_lj [cut_coul]
            # (pair_lj_cut_tip4p_long.cpp:431-454;
            #  pair_lj_cut_tip4p_cut.cpp::settings identical grammar)
            p.tip4p = (int(a[1]), int(a[2]), int(a[3]), int(a[4]),
                       float(a[5]))
            p.tip4p_mode = "cut" if a[0].endswith("/cut") else "long"
            p.cut_lj_global = float(a[6])
            p.cut_coul = float(a[7]) if len(a) > 7 else p.cut_lj_global
        elif a[0] in ("tip4p/long", "tip4p/cut"):
            # Coulomb-only off-site styles: otype htype btype atype qdist
            # cut_coul (pair_tip4p_cut.cpp::settings :374-387,
            # pair_tip4p_long.cpp::settings — both take exactly 6 args)
            p.tip4p = (int(a[1]), int(a[2]), int(a[3]), int(a[4]),
                       float(a[5]))
            p.tip4p_mode = "cut" if a[0].endswith("/cut") else "long"
            p.cut_coul = float(a[6])
            p.cut_lj_global = 0.0   # no vdW term
        elif a[0] == "table":
            # pair_style table linear N (pair_table.cpp); bitmap/spline
            # styles resample onto the same linear grid here
            self._table_n = int(a[2])
        else:
            raise ValueError(f"unsupported pair_style {a[0]}")
        self.pair = p

    def cmd_pair_coeff(self, a):
        self._invalidate()
        if self.pair.name.startswith("hbond/dreiding"):
            # pair_coeff i j k i|j eps sigma [ap [inner outer [angle]]]
            # (PairHbondDreidingLJ::coeff :317-384) — raw rows, resolved
            # in ops.hbond.make_hbond_params
            self.hbond_coeffs.append(list(a))
            return
        if self.pair.name in ("hybrid", "hybrid/overlay"):
            # pair_coeff I J sub-style [M] coeffs... (PairHybrid::coeff);
            # "none" removes the pair from every sub-style.  Tokens are
            # kept raw and replayed through the sub-style's own
            # cmd_pair_coeff at build time (sim._build_hybrid_pair).
            sub = a[2]
            if sub == "none":
                for store in self.hybrid_raw_coeffs:
                    store.append((a[0], a[1], None))
                return
            names = [s for s, _ in self.pair_hybrid]
            if sub not in names:
                raise ValueError(
                    f"pair_coeff sub-style {sub} not in hybrid list")
            rest = list(a[3:])
            k = names.index(sub)
            if names.count(sub) > 1:
                if not (rest and rest[0].isdigit()):
                    raise ValueError(
                        f"duplicate hybrid sub-style {sub} needs an index")
                k = [ix for ix, s in enumerate(names)
                     if s == sub][int(rest[0]) - 1]
                rest = rest[1:]
            self.hybrid_raw_coeffs[k].append((a[0], a[1], rest))
            return
        if self.pair.name.startswith("gran/"):
            # granular styles take no per-type coefficients
            # (PairGranHookeHistory::coeff, pair_gran_hooke_history.cpp:368)
            return
        if self.pair.name in ("eam/alloy", "eam/fs"):
            # pair_coeff * * file El1 El2 ... [NULL] — one element name
            # per type (pair_eam_alloy.cpp::coeff / pair_eam_fs.cpp::coeff);
            # mass from the setfl header
            if a[0] != "*" or a[1] != "*":
                raise ValueError(f"{self.pair.name} pair_coeff must be * *")
            self.eam_file = os.path.join(self.root, a[2])
            names = a[3:3 + self.ntypes]
            if len(names) != self.ntypes:
                raise ValueError(
                    f"{self.pair.name} needs {self.ntypes} element names, "
                    f"got {len(names)}")
            self.eam_type_elems = [None if s == "NULL" else s for s in names]
            from lidp_tpu.ops.eam import read_setfl

            d = read_setfl(self.eam_file, fs=self.pair.name == "eam/fs")
            if self.mass_type is None:
                self.mass_type = np.zeros(self.ntypes + 1)
            for t, name in enumerate(self.eam_type_elems, start=1):
                if name is None:
                    continue
                if name not in d["names"]:
                    raise ValueError(f"element {name} not found in "
                                     f"{self.eam_file}: has {d['names']}")
                if self.mass_type[t] == 0.0:
                    self.mass_type[t] = d["mass"][d["names"].index(name)]
            return
        if self.pair.name == "eam":
            self.eam_file = os.path.join(self.root, a[2])
            # mass comes from the funcfl header (pair_eam.cpp coeff/read_file)
            from lidp_tpu.ops.eam import read_funcfl

            mass = read_funcfl(self.eam_file)["mass"]
            if self.mass_type is None:
                self.mass_type = np.zeros(self.ntypes + 1)
            for t in range(1, self.ntypes + 1):
                if self.mass_type[t] == 0.0:
                    self.mass_type[t] = mass
            return
        _NCOEFF = {"morse": 3, "buck": 3, "buck/coul/cut": 3,
                   "buck/coul/long": 3, "yukawa": 1, "gauss": 2, "soft": 1,
                   "born": 5, "coul/cut": 0, "coul/long": 0,
                   "coul/debye": 0, "coul/msm": 0, "lj/expand": 3,
                   "born/coul/long": 5, "mie/cut": 4,
                   "born/coul/dsf": 5, "born/coul/wolf": 5, "beck": 5,
                   "born/coul/msm": 5, "buck/coul/msm": 3,
                   "coul/dsf": 0, "coul/wolf": 0, "zero": 0, "zbl": 2,
                   "dpd": 2, "dpd/tstat": 1, "buck/long/coul/long": 3}
        if self.pair.name in _NCOEFF and a[0] == "*" and a[1] == "*" \
                and self.pair.name.startswith("coul"):
            return   # coul styles take no per-pair coefficients
        if self.pair.name in ("tip4p/cut", "tip4p/long"):
            return   # Coulomb-only off-site styles: no per-pair coeffs
        if self.pair.name == "table":
            # pair_coeff i j FILE KEYWORD [cutoff]
            if a[0] == "*" or a[1] == "*":
                ii = range(1, self.ntypes + 1) if a[0] == "*" else [int(a[0])]
                jj = range(1, self.ntypes + 1) if a[1] == "*" else [int(a[1])]
                for i_ in ii:
                    for j_ in jj:
                        if i_ <= j_:
                            self.cmd_pair_coeff([str(i_), str(j_)]
                                                + list(a[2:]))
                return
            i, j = int(a[0]), int(a[1])
            path_t = os.path.join(self.root, a[2])
            r_t, e_t, f_t = _read_pair_table(path_t, a[3])
            cut = float(a[4]) if len(a) > 4 else float(r_t[-1])
            self.pair_coeffs[(min(i, j), max(i, j))] = (
                ("tablefile", r_t, e_t, f_t), 0.0, cut)
            return
        if a[0] == "*" or a[1] == "*":
            # pair_coeff * * ... — wildcard ranges (Force::bounds, force.cpp)
            ii = range(1, self.ntypes + 1) if a[0] == "*" else [int(a[0])]
            jj = range(1, self.ntypes + 1) if a[1] == "*" else [int(a[1])]
            for i_ in ii:
                for j_ in jj:
                    if i_ <= j_:
                        self.cmd_pair_coeff([str(i_), str(j_)] + list(a[2:]))
            return
        i, j = int(a[0]), int(a[1])
        if self.pair.name in _NCOEFF:
            nc = _NCOEFF[self.pair.name]
            vals = [float(v) for v in a[2:2 + nc]]
            cut = (float(a[2 + nc]) if len(a) > 2 + nc
                   else self.pair.cut_lj_global)
            self.pair_coeffs[(min(i, j), max(i, j))] = tuple(vals) + (cut,)
            return
        if self.pair.name in ("lj/gromacs", "lj/smooth"):
            # i j eps sigma [inner outer] (pair_lj_gromacs.cpp::coeff /
            # pair_lj_smooth.cpp::coeff)
            vals = (float(a[2]), float(a[3]))
            if len(a) > 5:
                vals += (float(a[4]), float(a[5]))
            else:
                vals += (self.pair.cut_lj_global,)
            self.pair_coeffs[(min(i, j), max(i, j))] = vals
            return
        eps, sig = float(a[2]), float(a[3])
        if "charmm" in self.pair.name:
            # i j eps sigma [eps14 sigma14]; cutoffs are global
            # (pair_lj_charmm_coul_long.cpp::coeff)
            if not hasattr(self, "pair_coeffs14"):
                self.pair_coeffs14 = {}
            if len(a) > 4:
                self.pair_coeffs14[(min(i, j), max(i, j))] = (
                    float(a[4]), float(a[5]))
            self.pair_coeffs[(min(i, j), max(i, j))] = (
                eps, sig, self.pair.cut_lj_global)
            return
        cut = float(a[4]) if len(a) > 4 else self.pair.cut_lj_global
        self.pair_coeffs[(min(i, j), max(i, j))] = (eps, sig, cut)

    ANGLE_STYLES = ("harmonic", "charmm", "cosine", "cosine/squared",
                    "cosine/delta", "cosine/periodic", "table", "zero",
                    "hybrid")
    DIHEDRAL_STYLES = ("opls", "harmonic", "charmm", "charmmfsw",
                       "multi/harmonic", "helix", "zero", "hybrid")
    IMPROPER_STYLES = ("harmonic", "cvff", "umbrella", "zero", "hybrid")
    BOND_STYLES = ("harmonic", "fene", "fene/expand", "morse", "nonlinear",
                   "gromos", "quartic", "table", "zero", "hybrid")

    @staticmethod
    def _coeff_vals(a):
        """Coefficient tokens: floats where possible, raw strings
        otherwise (table file/keyword args, hybrid sub-style names)."""
        out = []
        for v in a:
            try:
                out.append(float(v))
            except ValueError:
                out.append(v)
        return out

    def _bonded_types(self, tok, fam):
        """force->bounds for a bonded type token: N, *, N*, *M, N*M."""
        try:
            return [int(tok)]
        except ValueError:
            pass
        arr = getattr(self, f"_{fam}_types", None)
        tmax = getattr(self, "nbondtypes", 0) if fam == "bond" else 0
        if not tmax and arr is not None and len(arr):
            tmax = int(np.max(arr))
        lo, _, hi = tok.partition("*")
        return range(int(lo) if lo else 1, (int(hi) if hi else tmax) + 1)

    def cmd_angle_style(self, a):
        if a[0] not in self.ANGLE_STYLES:
            raise ValueError(f"unsupported angle_style {a[0]}")
        self.angle_style = a[0]
        self.angle_style_args = a[1:]    # table: interp + N; hybrid: subs
        self.angle_coeffs = {}

    def cmd_angle_coeff(self, a):
        vals = self._coeff_vals(a[1:])
        for t in self._bonded_types(a[0], "angle"):
            self.angle_coeffs[t] = vals

    def cmd_dihedral_style(self, a):
        if a[0] not in self.DIHEDRAL_STYLES:
            raise ValueError(f"unsupported dihedral_style {a[0]}")
        self.dihedral_style = a[0]
        self.dihedral_style_args = a[1:]
        self.dihedral_coeffs = {}

    def cmd_dihedral_coeff(self, a):
        vals = self._coeff_vals(a[1:])
        for t in self._bonded_types(a[0], "dihedral"):
            self.dihedral_coeffs[t] = vals

    def cmd_improper_style(self, a):
        if a[0] not in self.IMPROPER_STYLES:
            raise ValueError(f"unsupported improper_style {a[0]}")
        self.improper_style = a[0]
        self.improper_style_args = a[1:]
        self.improper_coeffs = {}

    def cmd_improper_coeff(self, a):
        vals = self._coeff_vals(a[1:])
        for t in self._bonded_types(a[0], "improper"):
            self.improper_coeffs[t] = vals

    def cmd_bond_style(self, a):
        if a[0] not in self.BOND_STYLES:
            raise ValueError(f"unsupported bond_style {a[0]}")
        self.bond_style = a[0]
        self.bond_style_args = a[1:]
        self.bond_coeffs = {}

    def cmd_bond_coeff(self, a):
        vals = self._coeff_vals(a[1:])
        for t in self._bonded_types(a[0], "bond"):
            self.bond_coeffs[t] = vals

    def cmd_kspace_style(self, a):
        if a[0] == "none":
            self.kspace = None
        else:
            self.kspace = (a[0], float(a[1]))

    def cmd_special_bonds(self, a):
        if a[0] == "lj/coul":
            vals = [float(v) for v in a[1:4]]
            self.special_lj[1:] = vals
            self.special_coul[1:] = vals
        elif a[0] == "lj":
            self.special_lj[1:] = [float(v) for v in a[1:4]]
        elif a[0] == "coul":
            self.special_coul[1:] = [float(v) for v in a[1:4]]
        elif a[0] == "fene":
            # special_bonds fene = lj/coul 0 1 1 (special_bonds doc)
            self.special_lj[1:] = [0.0, 1.0, 1.0]
            self.special_coul[1:] = [0.0, 1.0, 1.0]
        elif a[0] == "amber":
            self.special_lj[1:] = [0.0, 0.0, 0.5]
            self.special_coul[1:] = [0.0, 0.0, 1.0 / 1.2]
        elif a[0] == "charmm":
            # the charmm dihedral's weighted 1-4 term replaces the pair 1-4
            self.special_lj[1:] = [0.0, 0.0, 0.0]
            self.special_coul[1:] = [0.0, 0.0, 0.0]
        else:
            raise ValueError(f"unsupported special_bonds {a}")

    def cmd_group(self, a):
        name = a[0]
        n = self.x.shape[0]
        if a[1] == "molecule":
            op, val = a[2], float(a[3])
            m = self.mol.astype(float)
            sel = {
                ">": m > val, "<": m < val, ">=": m >= val,
                "<=": m <= val, "==": m == val, "!=": m != val,
            }[op]
        elif a[1] == "type":
            if a[2] in (">", "<", ">=", "<=", "==", "!="):
                t = self.type.astype(int)
                val = int(a[3])
                sel = {">": t > val, "<": t < val, ">=": t >= val,
                       "<=": t <= val, "==": t == val, "!=": t != val}[a[2]]
            else:
                sel = np.isin(self.type, [int(v) for v in a[2:]])
        elif a[1] == "id":
            sel = np.isin(np.arange(1, n + 1), [int(v) for v in a[2:]])
        elif a[1] == "region":
            # region bounds in lattice units; INF extends to +-infinity
            sel = self._region_mask(a[2])
        elif a[1] == "union":
            sel = np.zeros(n, bool)
            for gname in a[2:]:
                sel |= self.groups[gname]
        elif a[1] == "subtract":
            sel = self.groups[a[2]].copy()
            for gname in a[3:]:
                sel &= ~self.groups[gname]
        else:
            raise ValueError(f"unsupported group style {a[1]}")
        self.groups[name] = sel

    def cmd_compute(self, a):
        cid, group, style = a[0], a[1], a[2]
        if style == "group/group":
            # compute ID group1 group/group group2 — pairwise LJ+coul energy
            # between groups via single() (compute_group_group.cpp)
            self.computes[cid] = (group, style, a[3])
            return
        if style == "msd":
            # reference positions captured at definition (compute_msd.cpp)
            self.computes[cid] = (group, style,
                                  (self.x + self.image
                                   * (self.box_hi - self.box_lo)).copy())
            return
        if style == "rdf":
            self.computes[cid] = (group, style, int(a[3]))
            return
        if style == "slice":
            # compute ID group slice Nstart Nstop Nskip input...
            # (compute_slice.cpp): extract rows of global vectors/arrays
            self.computes[cid] = (group, style, {
                "start": int(a[3]), "stop": int(a[4]),
                "skip": int(a[5]), "inputs": list(a[6:])})
            return
        if style in ("pair/local", "bond/local", "angle/local",
                     "dihedral/local", "improper/local",
                     "property/local"):
            # value keywords evaluated at dump-local time
            # (compute_pair_local.cpp / compute_bond_local.cpp)
            self.computes[cid] = (group, style, list(a[3:]))
            return
        if style in ("temp/partial", "temp/com"):
            self.computes[cid] = (group, style,
                                  tuple(int(v) for v in a[3:6])
                                  if style == "temp/partial" else ())
            return
        if style in ("com", "gyration", "ke", "pe"):
            # host-evaluated global computes (compute_com.cpp,
            # compute_gyration.cpp, compute_ke.cpp, compute_pe.cpp)
            self.computes[cid] = (group, style, None)
            return
        if style == "vacf":
            # reference velocities captured at definition
            # (compute_vacf.cpp stores v at creation)
            self.computes[cid] = (group, style, self.v.copy())
            return
        if style in ("ke/atom", "pe/atom", "stress/atom"):
            # stress/atom takes a bias temp-ID (compute_stress_atom.cpp:42)
            if style == "stress/atom" and len(a) > 3 and a[3] != "NULL":
                raise NotImplementedError(
                    "compute stress/atom supports temp-ID NULL only")
            self.computes[cid] = (group, style, {})
            return
        if style in ("coord/atom", "cluster/atom"):
            # compute ID group coord/atom cutoff X | cluster/atom X
            # (compute_coord_atom.cpp:46, compute_cluster_atom.cpp)
            cut_tok = a[4] if a[3] == "cutoff" else a[3]
            self.computes[cid] = (group, style,
                                  {"cutoff": float(cut_tok)})
            return
        if style == "displace/atom":
            # unwrapped displacement from creation-time coords
            # (compute_displace_atom.cpp set_arrays)
            self.computes[cid] = (group, style, {
                "x0": (self.x + self.image
                       * (self.box_hi - self.box_lo)).copy()})
            return
        if style == "property/atom":
            self.computes[cid] = (group, style, {"fields": list(a[3:])})
            return
        if style in ("centro/atom", "cna/atom"):
            # centro/atom fcc|bcc|N (compute_centro_atom.cpp:45-47);
            # cna/atom cutoff (compute_cna_atom.cpp)
            self.computes[cid] = (group, style, {"arg": a[3]})
            return
        if style == "global/atom":
            # compute ID group global/atom ref input...
            # (compute_global_atom.cpp): per-atom indices (1-based,
            # rounded down) into global vectors/array columns
            self.computes[cid] = (group, style, {"ref": a[3],
                                                 "inputs": list(a[4:])})
            return
        if style in ("orientorder/atom", "hexorder/atom"):
            # orientorder/atom [nnn N] [degrees nq l1..] [components l]
            # [cutoff c] (compute_orientorder_atom.cpp);
            # hexorder/atom [degree n] [nnn N] [cutoff c]
            d = {}
            i = 3
            while i < len(a):
                if a[i] == "nnn":
                    d["nnn"] = (0 if a[i + 1] == "NULL"
                                else int(a[i + 1]))
                    i += 2
                elif a[i] == "degrees":
                    nq = int(a[i + 1])
                    d["degrees"] = [int(v) for v in a[i + 2:i + 2 + nq]]
                    i += 2 + nq
                elif a[i] == "degree":
                    d["degree"] = int(a[i + 1]); i += 2
                elif a[i] == "components":
                    d["components"] = int(a[i + 1]); i += 2
                elif a[i] == "cutoff":
                    d["cutoff"] = float(a[i + 1]); i += 2
                else:
                    raise ValueError(f"{style} keyword {a[i]}")
            self.computes[cid] = (group, style, {"arg": d})
            return
        if style in ("fragment/atom", "aggregate/atom"):
            spec = ({"cutoff": float(a[3])} if style == "aggregate/atom"
                    else {})
            self.computes[cid] = (group, style, spec)
            return
        if style == "heat/flux":
            # compute ID group heat/flux ke-ID pe-ID stress-ID
            # (compute_heat_flux.cpp)
            self.computes[cid] = (group, style, {"ids": list(a[3:6])})
            return
        if style in ("reduce", "reduce/region"):
            # compute ID group reduce [region rid] mode inputs...
            # (compute_reduce.cpp)
            args = list(a[3:])
            region = None
            if style == "reduce/region":
                region, args = args[0], args[1:]
            mode = args[0]
            self.computes[cid] = (group, "reduce", {
                "mode": mode, "inputs": args[1:], "region": region})
            return
        if style in ("temp/ramp", "temp/region", "temp/profile",
                     "temp/deform"):
            # velocity-bias temperature variants (compute_temp_ramp.cpp,
            # compute_temp_region.cpp, compute_temp_profile.cpp,
            # compute_temp_deform.cpp)
            self.computes[cid] = (group, style, list(a[3:]))
            return
        if style == "erotate/sphere":
            # rotational KE of sphere atoms (compute_erotate_sphere.cpp)
            self.computes[cid] = (group, style, None)
            return
        if style == "pressure":
            # compute ID group pressure temp-ID [virial|ke|pair|...]
            # (compute_pressure.cpp): scalar pressure using the named
            # temperature compute's kinetic tensor (NULL -> virial only)
            self.computes[cid] = (group, style, {
                "temp": a[3] if len(a) > 3 else "NULL",
                "kw": list(a[4:])})
            return
        if style == "temp/sphere":
            # translational + rotational temperature of sphere atoms
            # (compute_temp_sphere.cpp; dof = 6/atom for finite radius)
            self.computes[cid] = (group, style, list(a[3:]))
            return
        if style in ("erotate/sphere/atom", "contact/atom"):
            # per-atom rotational KE (compute_erotate_sphere_atom.cpp) /
            # contact count (compute_contact_atom.cpp)
            self.computes[cid] = (group, style, {})
            return
        if style == "chunk/atom":
            # compute ID group chunk/atom bin/1d dim origin delta
            #   [units box|reduced|lattice] | type | molecule
            # (compute_chunk_atom.cpp; bins follow the setup_bins rules)
            spec = {"which": a[3]}
            if a[3] in ("bin/1d", "bin/2d", "bin/3d"):
                nd = int(a[3][4])
                dims, origins, deltas = [], [], []
                i = 4
                for _ in range(nd):
                    dims.append({"x": 0, "y": 1, "z": 2}[a[i]])
                    origins.append(a[i + 1])   # lower|center|upper|coord
                    deltas.append(float(a[i + 2]))
                    i += 3
                # bin/1d keeps the legacy scalar keys; 2d/3d use lists
                spec["dims"] = dims
                spec["origins"] = origins
                spec["deltas"] = deltas
                spec["dim"] = dims[0]
                spec["origin"] = origins[0]
                spec["delta"] = deltas[0]
                spec["units"] = "lattice"
                while i < len(a):
                    if a[i] == "units":
                        spec["units"] = a[i + 1]; i += 2
                    else:
                        i += 2
            elif a[3] not in ("type", "molecule"):
                raise ValueError(f"unsupported chunk/atom style {a[3]}")
            self.computes[cid] = (group, style, spec)
            return
        if style in ("com/chunk", "vcm/chunk", "msd/chunk",
                     "gyration/chunk", "angmom/chunk", "omega/chunk",
                     "torque/chunk", "inertia/chunk", "dipole/chunk",
                     "property/chunk", "temp/chunk"):
            # compute ID group <style>/chunk chunkID [values/keywords]
            # (compute_com_chunk.cpp and siblings)
            self.computes[cid] = (group, style,
                                  {"chunk": a[3], "extra": list(a[4:])})
            return
        if style in ("ke/rigid", "erotate/rigid"):
            # compute ID group ke/rigid fix-ID (compute_ke_rigid.cpp:60-75)
            # / erotate/rigid (compute_erotate_rigid.cpp:111-126): body
            # translational / rotational KE of the named rigid fix
            self.computes[cid] = (group, style, a[3])
            return
        if style == "rigid/local":
            # compute ID group rigid/local fix-ID value1 ...
            # (compute_rigid_local.cpp:61-96): one row per rigid body
            self.computes[cid] = (group, style,
                                  {"fix": a[3], "values": list(a[4:])})
            return
        if style != "temp":
            raise ValueError(f"unsupported compute style {style}")
        self.computes[cid] = (group, style)

    def cmd_thermo_style(self, a):
        if a[0] == "multi":
            # thermo.cpp MULTI field set (one row per step here, not the
            # reference's 4-line block)
            self.thermo_columns = [
                "step", "etotal", "ke", "temp", "pe", "ebond", "eangle",
                "edihed", "eimp", "evdwl", "ecoul", "elong", "press"]
            return
        if a[0] == "one":
            self.thermo_columns = ["step", "temp", "epair", "emol",
                                   "etotal", "press"]
            return
        assert a[0] == "custom"
        self.thermo_columns = a[1:]

    def cmd_thermo(self, a):
        self.thermo_every = int(a[0])

    def cmd_thermo_modify(self, a):
        i = 0
        while i < len(a):
            if a[i] == "norm":
                self._thermo_norm = _yesno(a[i + 1]); i += 2
            elif a[i] == "temp":
                # thermo_modify temp ID: thermo temp/ke/press use this
                # compute's group + dof (thermo.cpp modify_params)
                self._thermo_temp = a[i + 1]; i += 2
                self._invalidate()
            elif a[i] == "format":
                # thermo_modify format float FMT | int FMT | M FMT
                # (thermo.cpp:586); only the float-wide form is supported
                if a[i + 1] == "float":
                    self._thermo_float_format = a[i + 2]
                elif a[i + 1] == "none":
                    self._thermo_float_format = None
                i += 3
            else:
                i += 2

    def cmd_timer(self, a):
        # timer [normal|full|loop|off] [timeout elapse] [every N]
        # (timer.cpp modify_params; check_timeout ends the run cleanly at
        # the next chunk boundary, verlet.cpp:241)
        i = 0
        while i < len(a):
            if a[i] == "timeout":
                t = a[i + 1]
                if t == "off" or t == "unlimited":
                    self._timer_timeout = None
                elif ":" in t:
                    parts = [float(v) for v in t.split(":")]
                    secs = 0.0
                    for p_ in parts:
                        secs = secs * 60.0 + p_
                    self._timer_timeout = secs
                else:
                    self._timer_timeout = float(t)
                i += 2
            elif a[i] == "every":
                i += 2   # chunk boundaries already bound the check cadence
            else:
                self._timer_mode = a[i]
                i += 1
        if not a:
            self._timer_mode = "normal"

    def cmd_dump(self, a):
        did, group, style, every = a[0], a[1], a[2], int(a[3])
        path = os.path.join(self.root, a[4])
        if style == "atom":
            # dump_atom.cpp default columns: id type xs ys zs (scaled coords)
            cols = ["id", "type", "xs", "ys", "zs"]
        elif style == "custom":
            cols = a[5:]
        elif style == "xyz":
            cols = ["type", "x", "y", "z"]
        elif style == "dcd":
            cols = []
        elif style == "cfg":
            # dump_cfg.cpp: mandatory 'mass type xs ys zs' prefix
            cols = a[5:]
        elif style == "local":
            # dump_local.cpp: index / c_ID[n] column tokens
            cols = a[5:]
        elif style == "image":
            # dump_image.cpp: color attr, diameter attr, then keywords
            # (size/zoom/adiam/view supported by the PPM rasterizer)
            cols = a[5:]
        elif style == "movie":
            # dump_movie.cpp: image frames piped to ffmpeg.  Frames
            # rasterize as numbered PPMs next to the output; they are
            # assembled into the movie at undump/script end when ffmpeg
            # exists on PATH (this image has none, so the frames stand —
            # the reference built without LAMMPS_FFMPEG errors outright)
            cols = a[5:]
        else:
            raise ValueError(f"unsupported dump style {style}")
        self.dumps[did] = DumpSpec(did=did, group=group, style=style,
                                   every=every, path=path, columns=cols)

    def cmd_dump_modify(self, a):
        if a[0] not in self.dumps:
            return
        if "sort" in a:
            self.dumps[a[0]].sort_id = True
        if "format" in a:
            # dump_modify ID format float FMT (dump.cpp modify_params)
            i = a.index("format")
            if a[i + 1] == "float":
                self.dumps[a[0]].float_fmt = a[i + 2]

    def cmd_undump(self, a):
        self.dumps.pop(a[0], None)

    def cmd_velocity(self, a):
        # adopt any evolved state FIRST: velocity edits compose with the
        # positions/velocities of the last run, not the initial ones
        self._invalidate()
        group = a[0]
        if a[1] == "set":
            # velocity group set vx vy vz (velocity.cpp::set; NULL keeps).
            # Default units are LATTICE (scale_flag=1, velocity.cpp options):
            # components scale by the per-axis lattice spacing.
            units_box = "units" in a and a[a.index("units") + 1] == "box"
            s3 = np.ones(3) if units_box else self._spacing3()
            gm = self.groups[group]
            for d, tok in enumerate(a[2:5]):
                if tok != "NULL":
                    self.v[gm, d] = float(tok) * s3[d]
            self._invalidate()
            return
        if a[1] == "zero":
            # velocity group zero linear|angular (velocity.cpp::zero_momentum)
            gm = self.groups[group]
            m = self.mass_type[self.type][gm]
            if a[2] == "linear":
                self.v[gm] -= (m[:, None] * self.v[gm]).sum(0) / m.sum()
            else:
                # velocity zero angular (velocity.cpp zero_rotation)
                xu = (self.x + self.image
                      * (self.box_hi - self.box_lo))[gm]
                xcm = (m[:, None] * xu).sum(0) / m.sum()
                d = xu - xcm
                Lang = (m[:, None] * np.cross(d, self.v[gm])).sum(0)
                inertia = np.zeros((3, 3))
                inertia[0, 0] = np.sum(m * (d[:, 1]**2 + d[:, 2]**2))
                inertia[1, 1] = np.sum(m * (d[:, 0]**2 + d[:, 2]**2))
                inertia[2, 2] = np.sum(m * (d[:, 0]**2 + d[:, 1]**2))
                inertia[0, 1] = inertia[1, 0] = -np.sum(
                    m * d[:, 0] * d[:, 1])
                inertia[0, 2] = inertia[2, 0] = -np.sum(
                    m * d[:, 0] * d[:, 2])
                inertia[1, 2] = inertia[2, 1] = -np.sum(
                    m * d[:, 1] * d[:, 2])
                omega = np.linalg.solve(inertia, Lang)
                self.v[gm] -= np.cross(omega, d)
            self._invalidate()
            return
        if a[1] == "scale":
            # velocity group scale T (velocity.cpp::scale)
            gm = self.groups[group]
            m = self.mass_type[self.type][gm]
            ke2 = float((m[:, None] * self.v[gm] ** 2).sum()) * self.units.mvv2e
            dof = 3 * int(gm.sum()) - 3
            t_cur = ke2 / (dof * self.units.boltz)
            self.v[gm] *= np.sqrt(float(a[2]) / t_cur)
            self._invalidate()
            return
        if a[1] == "ramp":
            # velocity group ramp vdim vlo vhi cdim clo chi [sum yes]
            # (velocity.cpp:631) — lattice units scale both v and coords
            s3 = self._spacing3()
            v_dim = "vx vy vz".split().index(a[2])
            c_dim = "xyz".index(a[5])
            sum_flag = False
            units_box = False
            i = 8
            while i < len(a):
                if a[i] == "sum":
                    sum_flag = _yesno(a[i + 1])
                elif a[i] == "units":
                    units_box = a[i + 1] == "box"
                i += 2
            vs = 1.0 if units_box else s3[v_dim]
            cs = 1.0 if units_box else s3[c_dim]
            self.v = velocity_mod.ramp(
                self.x, self.v, self.groups[group], v_dim,
                float(a[3]) * vs, float(a[4]) * vs,
                c_dim, float(a[6]) * cs, float(a[7]) * cs, sum_flag)
            self._invalidate()
            return
        assert a[1] == "create"
        t_desired = float(a[2])
        seed = int(a[3])
        # velocity.cpp options() defaults: dist uniform, loop all, mom YES,
        # rot no
        kw = dict(dist="uniform", loop="all", momentum=True, rotation=False)
        temp_cid = None
        i = 4
        while i < len(a):
            k, v = a[i], a[i + 1]
            if k == "dist":
                kw["dist"] = v
            elif k == "loop":
                kw["loop"] = v
            elif k == "mom":
                kw["momentum"] = _yesno(v)
            elif k == "rot":
                kw["rotation"] = _yesno(v)
            elif k == "temp":
                temp_cid = v   # rescale via this compute's group
            elif k == "units":
                pass
            i += 2
        gm = self.groups[group]
        tg = None
        if temp_cid is not None:
            tg = self.groups[self.computes[temp_cid][0]]
        mass_atom = self.mass_type[self.type]
        self.v = velocity_mod.create(
            self.x, mass_atom, t_desired, seed, units=self.units,
            image=self.image, box_lengths=self.box_hi - self.box_lo,
            dim=self.dimension,
            group=None if group == "all" else gm,
            v_prev=self.v, temp_group=tg, **kw)
        self._invalidate()

    def cmd_fix(self, a):
        fid, group, style = a[0], a[1], a[2]
        if style.startswith("ave/spatial"):
            # fix_deprecated.cpp: ave/spatial was replaced by
            # ave/chunk + chunk/atom; the reference prints this NOTE and
            # errors — exact behavioral parity
            self.log(
                "\nNOTE: The fix styles 'ave/spatial' and "
                "'ave/spatial/sphere' have been replaced\nby the more "
                "general fix ave/chunk and compute chunk/atom "
                "commands.\n")
            raise ValueError("This fix style is no longer available")
        if style == "balance":
            # fix balance Nevery thresh shift|rcb ... (fix_balance.cpp):
            # the GSPMD atom-axis sharding is uniform by construction, so
            # rebalancing is a no-op; accepted and reported
            self.cmd_balance(a[3:])
            return
        if style not in ("nve", "nvt", "npt", "nph", "rigid", "rigid/nve",
                         "rigid/nvt", "langevin", "shake", "rattle",
                         "temp/rescale", "temp/berendsen", "enforce2d",
                         "setforce", "addforce", "aveforce", "spring/self",
                         "viscous", "efield", "momentum", "recenter",
                         "halt", "neb", "adapt", "deform", "wall/reflect",
                         "wall/lj93", "wall/lj126", "wall/lj1043",
                         "wall/harmonic", "wall/region", "planeforce",
                         "lineforce",
                         "indent", "print", "ave/time", "ave/chunk",
                         "gravity", "freeze", "wall/gran",
                         "wall/gran/region", "pour",
                         "nve/sphere", "nvt/sphere",
                         "npt/sphere", "nph/sphere", "nve/limit",
                         "nve/noforce", "spring", "spring/rg", "drag",
                         "move", "heat", "ehex", "temp/csvr", "temp/csld",
                         "rigid/small", "rigid/nve/small",
                         "rigid/nvt/small", "rigid/npt", "rigid/nph",
                         "rigid/npt/small", "rigid/nph/small",
                         "store/state", "ave/atom",
                         "ave/histo", "ave/correlate", "vector",
                         "press/berendsen", "nvt/sllod", "dt/reset",
                         "restrain", "spring/chunk", "store/force",
                         "ave/histo/weight", "box/relax", "controller",
                         "external", "tmd", "cmap"):
            raise ValueError(f"unsupported fix style {style}")
        self.fixes[fid] = FixSpec(fid=fid, group=group, style=style, args=a[3:])
        self._invalidate()

    def cmd_fix_modify(self, a):
        # fix_modify ID temp COMPUTE-ID (fix.cpp modify_params): the fix
        # uses the named temperature compute's group/dof
        if not hasattr(self, "_fix_modify"):
            self._fix_modify = {}
        d = self._fix_modify.setdefault(a[0], {})
        i = 1
        while i < len(a):
            d[a[i]] = a[i + 1]
            i += 2
        self._invalidate()

    def cmd_unfix(self, a):
        self.fixes.pop(a[0], None)
        self._invalidate()

    def cmd_delete_atoms(self, a):
        """delete_atoms region ID | group ID | overlap cut g1 g2 |
        porosity region frac seed (delete_atoms.cpp) — compacts every
        per-atom host array."""
        self._invalidate()
        if a[0] == "region":
            kill = self._region_mask(a[1])
        elif a[0] == "group":
            kill = self.groups[a[1]].copy()
        elif a[0] == "overlap":
            kill = self._delete_overlap(float(a[1]), a[2], a[3])
        elif a[0] == "porosity":
            kill = self._delete_porosity(a[1], float(a[2]), int(a[3]))
        else:
            raise NotImplementedError(f"delete_atoms {a[0]}")
        keep = ~kill
        if getattr(self, "_bonds", None) is not None and len(self._bonds):
            raise NotImplementedError("delete_atoms with bonds present")
        for attr in ("x", "v", "q", "type", "mol", "image"):
            setattr(self, attr, np.asarray(getattr(self, attr))[keep])
        self.groups = {k: np.asarray(v)[keep]
                       for k, v in self.groups.items()}
        self.log(f"Deleted {int(kill.sum())} atoms, "
                 f"new total = {self.x.shape[0]}")

    def _delete_overlap(self, cut, g1, g2):
        """delete_atoms overlap cut group1 group2
        (delete_atoms.cpp:260 DeleteAtoms::delete_overlap, serial
        semantics): scan atoms in index order; delete atom i (in group1)
        when some not-yet-deleted atom j (in group2) lies within cut.
        Pairs whose special_lj AND special_coul factors are both zero are
        skipped — with no topology present every pair qualifies."""
        x = np.asarray(self.x, np.float64)
        n = x.shape[0]
        if getattr(self, "_bonds", None) is not None and len(self._bonds):
            # special-factor exclusion needs the 1-2/1-3/1-4 maps; the
            # supported use-case (post create_atoms cleanup) has none
            raise NotImplementedError("delete_atoms overlap with bonds")
        in1 = np.asarray(self.groups[g1], bool)
        in2 = np.asarray(self.groups[g2], bool)
        L = (self.box_hi - self.box_lo).astype(np.float64)
        per = np.asarray(self.periodic, bool)
        cutsq = cut * cut
        # adjacency in chunks (O(N^2) candidate pass, then the reference's
        # sequential sweep on the short lists).  Each neighbor entry also
        # records whether the minimum image crossed a periodic boundary:
        # in a serial reference run that pair's j is a GHOST, and
        # delete_atoms.cpp:404-407 applies a different rule there —
        # mutual candidate pairs (i in g2 && j in g1) tie-break on tags
        # (skip iff tag[i] > tag[j], so only the lower-tag atom dies);
        # non-mutual pairs delete i REGARDLESS of dlist[j].
        neigh = [[] for _ in range(n)]
        chunk = max(1, min(n, 4_000_000 // max(n, 1) + 1))
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            d = x[s:e, None, :] - x[None, :, :]
            crossed = np.zeros(d.shape[:2], bool)
            for k in range(3):
                if per[k]:
                    shift = np.round(d[:, :, k] / L[k])
                    d[:, :, k] -= L[k] * shift
                    crossed |= shift != 0
            rsq = (d * d).sum(-1)
            ii, jj = np.nonzero(
                (rsq < cutsq) & in1[s:e, None] & in2[None, :])
            ghost = crossed[ii, jj]
            ii += s
            keep_pair = ii != jj
            for i, j, g in zip(ii[keep_pair], jj[keep_pair],
                               ghost[keep_pair]):
                neigh[i].append((j, bool(g)))
        dlist = np.zeros(n, bool)
        for i in range(n):
            for j, ghost in neigh[i]:
                if not ghost:
                    # local j: skip if j already deleted
                    if dlist[j]:
                        continue
                elif in2[i] and in1[j]:
                    # ghost j, mutual candidate: tag tie-break (tags are
                    # index+1 here, so compare indices)
                    if i > j:
                        continue
                # ghost j, non-mutual: delete i unconditionally
                dlist[i] = True
                break
        return dlist

    def _delete_porosity(self, region, frac, seed):
        """delete_atoms porosity region frac seed
        (delete_atoms.cpp:420): one RanMars uniform draw per atom inside
        the region, in atom order; delete when uniform() <= frac."""
        from lidp_tpu.rng import RanMars
        rng = RanMars(seed)
        inside = np.asarray(self._region_mask(region), bool)
        dlist = np.zeros(inside.shape[0], bool)
        for i in np.nonzero(inside)[0]:
            if rng.uniform() <= frac:
                dlist[i] = True
        return dlist

    def cmd_run(self, a):
        nsteps = int(a[0])
        if len(a) > 1 and a[1] == "upto":
            nsteps = max(0, nsteps - int(self.step))
        every = getattr(self, "_restart_every", 0)
        if every > 0:
            # restart N file: checkpoint on the N-step cadence
            # (output.cpp write_restart), alternating between two names.
            # ramp()/elapsed span the WHOLE run, not each segment.
            self._run_begin = int(self.step)
            self._run_end = int(self.step) + int(nsteps)
            self._in_run = True
            k = getattr(self, "_restart_toggle", 0)
            first_seg = True
            while nsteps > 0:
                seg = min(every - (self.step % every) or every, nsteps)
                # segments after the first share the run: don't re-emit
                # the boundary thermo row (the reference prints each step
                # once per run)
                self._suppress_start_row = not first_seg
                self._run(seg)
                first_seg = False
                nsteps -= seg
                if self.step % every == 0:
                    files = self._restart_files
                    self.cmd_write_restart([files[k % len(files)]])
                    k += 1
            self._suppress_start_row = False
            self._restart_toggle = k
            self._in_run = False
            return
        self._run(nsteps)

    def cmd_pair_write(self, a):
        """pair_write itype jtype N r|rsq inner outer file keyword [qi qj] —
        Pair::write_file (pair.cpp:1549): table of (i, r, E, F) rows from
        single(); appends in pair_style-table format."""
        import numpy as np_

        from lidp_tpu.ops.pair import pair_single
        from lidp_tpu.sim import Simulation

        itype, jtype, n = int(a[0]), int(a[1]), int(a[2])
        style = a[3]
        inner, outer = float(a[4]), float(a[5])
        if inner <= 0.0 or inner >= outer:
            raise ValueError("Invalid cutoffs in pair_write command")
        if style not in ("r", "rsq"):
            raise ValueError(f"Invalid style in pair_write command: {style}")
        path = os.path.join(self.root, a[6])
        keyword = a[7] if len(a) > 7 else "TABLE"
        qi = float(a[8]) if len(a) > 8 else 1.0
        qj = float(a[9]) if len(a) > 9 else 1.0
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        pp = self._sim.runner.ff.pair
        if pp is None:
            raise ValueError("Pair style does not support pair_write")
        i_ = np_.arange(n)
        if style == "r":
            r = inner + (outer - inner) * i_ / (n - 1)
            rsq = r * r
        else:
            rsq = inner**2 + (outer**2 - inner**2) * i_ / (n - 1)
            r = np_.sqrt(rsq)
        e, ff_ = pair_single(rsq, itype, jtype, qi, qj, pp)
        e, ff_ = np_.asarray(e), np_.asarray(ff_) * r
        incut = rsq < float(np_.asarray(pp.cutsq)[itype, jtype])
        e = np_.where(incut, e, 0.0)
        ff_ = np_.where(incut, ff_, 0.0)
        with open(path, "a") as fh:
            fh.write(f"# Pair potential {self.pair.name} for atom types "
                     f"{itype} {jtype}: i,r,energy,force\n")
            fh.write(f"\n{keyword}\nN {n} {'R' if style == 'r' else 'RSQ'} "
                     f"{inner:.15g} {outer:.15g}\n\n")
            for k in range(n):
                fh.write(f"{k+1} {r[k]:.15g} {e[k]:.15g} {ff_[k]:.15g}\n")

    def cmd_write_data(self, a):
        """write_data file — inverse of read_data (write_data.cpp)."""
        from lidp_tpu.io.data_writer import write_data

        write_data(os.path.join(self.root, a[0]), self)

    def cmd_temper(self, a):
        """temper N M temp fix-ID seed_swap seed_boltz — REPLICA/temper.cpp.

        `temp` arrives $-substituted to world 0's value; the replica ladder
        is the full value list of the (unique) world-style variable.  One
        replica per ladder entry, all batched in one vmapped program."""
        from lidp_tpu.replica import temper_run
        from lidp_tpu.sim import Simulation

        nsteps, nevery = int(a[0]), int(a[1])
        seed_swap, seed_boltz = int(a[4]), int(a[5])
        wv = getattr(self, "_world_vars", {})
        if len(wv) != 1:
            raise ValueError("temper needs exactly one world-style variable "
                             "holding the temperature ladder")
        temps = [float(v) for v in next(iter(wv.values()))]
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        result = temper_run(self._sim, temps, nsteps, nevery,
                            seed_swap, seed_boltz, log=self.log)
        self._temper_result = result
        self.step += nsteps

    def cmd_neb(self, a):
        """neb etol ftol N1 N2 Nevery final FILE [nreplicas M] —
        REPLICA/neb.cpp with replicas as a batch axis instead of
        partitions (M defaults to 8; the reference takes it from
        -partition).  Requires a `fix ... neb Kspring`."""
        import numpy as np_

        from lidp_tpu import replica as replica_mod
        from lidp_tpu.sim import Simulation

        etol, ftol = float(a[0]), float(a[1])
        n1, n2 = int(a[2]), int(a[3])
        style = a[5]
        if style != "final":
            raise NotImplementedError(f"neb file style {style}")
        m = 8
        if "nreplicas" in a:
            m = int(a[a.index("nreplicas") + 1])
        kspring = None
        neb_group = None
        for f_ in self.fixes.values():
            if f_.style == "neb":
                kspring = float(f_.args[0])
                neb_group = self.groups[f_.group]
        if kspring is None:
            raise ValueError("neb requires a fix of style neb")
        x_final = self.x.copy()
        with open(os.path.join(self.root, a[6])) as fh:
            for line in fh:
                t = line.split("#")[0].split()
                if len(t) == 1:
                    continue   # leading atom-count line
                if len(t) >= 4:
                    x_final[int(t[0]) - 1] = [float(v) for v in t[1:4]]
        # drop the neb fix for force evaluation; need an integrator-free sim
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        X, E, barrier = replica_mod.neb_run(
            self._sim, x_final, m, kspring, etol, ftol, n1, n2,
            log=self.log,
            gmask=None if neb_group is None or neb_group.all()
            else neb_group)
        self.neb_energies = np_.asarray(E)
        self.neb_barrier = barrier
        self.neb_path = np_.asarray(X)

    def cmd_prd(self, a):
        """prd Nsegments t_event t_dephase temp threshold seed
        [nreplicas M] [group NAME] — REPLICA/prd.cpp with replicas as a
        batch axis instead of partitions."""
        from lidp_tpu import replica as replica_mod
        from lidp_tpu.sim import Simulation

        nseg, t_event, t_dephase = int(a[0]), int(a[1]), int(a[2])
        temp, threshold, seed = float(a[3]), float(a[4]), int(a[5])
        m = 8
        gname = None
        if "nreplicas" in a:
            m = int(a[a.index("nreplicas") + 1])
        if "group" in a:
            gname = a[a.index("group") + 1]
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        gmask = None
        if gname is not None and not self.groups[gname].all():
            gmask = self.groups[gname]
        self.prd_result = replica_mod.prd_run(
            self._sim, m, nseg, t_event, t_dephase, temp, threshold, seed,
            gmask=gmask, log=self.log)

    def cmd_tad(self, a):
        """tad Nseg t_event t_dephase T_hi T_lo delta threshold seed
        [nreplicas M] [group NAME] — REPLICA/tad.cpp (barriers via NEB,
        Arrhenius extrapolation to T_lo)."""
        from lidp_tpu import replica as replica_mod
        from lidp_tpu.sim import Simulation

        nseg, t_event, t_dephase = int(a[0]), int(a[1]), int(a[2])
        t_hi, t_lo, delta = float(a[3]), float(a[4]), float(a[5])
        threshold, seed = float(a[6]), int(a[7])
        m = 8
        gname = None
        if "nreplicas" in a:
            m = int(a[a.index("nreplicas") + 1])
        if "group" in a:
            gname = a[a.index("group") + 1]
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        gmask = None
        if gname is not None and not self.groups[gname].all():
            gmask = self.groups[gname]
        self.tad_result = replica_mod.tad_run(
            self._sim, nseg, t_event, t_dephase, t_hi, t_lo, delta,
            threshold, seed, gmask=gmask, log=self.log, neb_replicas=m)

    def cmd_run_style(self, a):
        """run_style verlet | respa N n1.. [bond l] [angle l] [dihedral l]
        [improper l] [pair l] [kspace l] (update.cpp create_integrate +
        respa.cpp settings)."""
        if a[0] == "verlet":
            self._respa = None
            return
        if a[0] != "respa":
            raise ValueError(f"unsupported run_style {a[0]}")
        nlev = int(a[1])
        loops = tuple(int(v) for v in a[2:1 + nlev])
        # defaults (respa.cpp): bond innermost, pair/kspace outermost
        level = {"bond": 1, "angle": 1, "dihedral": 1, "improper": 1,
                 "pair": nlev, "kspace": nlev}
        i = 1 + nlev
        while i < len(a):
            k = a[i]
            if k not in level:
                raise ValueError(f"unsupported respa keyword {k}")
            level[k] = int(a[i + 1])
            i += 2
        terms = [[] for _ in range(nlev)]
        for k, l in level.items():
            terms[l - 1].append(k)
        terms[nlev - 1].append("polar")   # SCF rides the outermost level
        self._respa = (loops, tuple(tuple(t) for t in terms))
        self._invalidate()

    def cmd_min_style(self, a):
        if a[0] not in ("fire", "cg", "sd", "quickmin", "hftn"):
            raise ValueError(f"unsupported min_style {a[0]}")
        self._min_style = a[0]

    def cmd_minimize(self, a):
        """minimize etol ftol maxiter maxeval (Min::run) with the current
        min_style: cg (default, min_cg.cpp), sd (min_sd.cpp), or fire."""
        import jax

        from lidp_tpu.forcefield import compute_forces
        from lidp_tpu.integrate.minimize import cg_minimize, fire_minimize
        from lidp_tpu.sim import Simulation

        etol, ftol, maxiter = float(a[0]), float(a[1]), int(a[2])
        if self._sim is None:
            self._sim = Simulation.from_script(self)
        sim = self._sim
        ff = sim.runner.ff
        mass_atom = self.mass_type[self.type]

        def compute(sys):
            res = compute_forces(sys, ff)
            return res.f, res.epair

        import jax.numpy as jnp

        style = getattr(self, "_min_style", "cg")
        if style == "fire":
            run_min = lambda s_: fire_minimize(   # noqa: E731
                s_, compute, jnp.asarray(mass_atom, self.dtype),
                etol=etol, ftol=ftol, maxiter=maxiter)
        elif style == "quickmin":
            from lidp_tpu.integrate.minimize import quickmin_minimize

            dmax = float(getattr(self, "_min_modify", {}).get("dmax", 0.1))
            run_min = lambda s_: quickmin_minimize(   # noqa: E731
                s_, compute, jnp.asarray(mass_atom, self.dtype),
                etol=etol, ftol=ftol, maxiter=maxiter, dt=self.dt,
                dmax=dmax, ftm2v=self.units.ftm2v)
        elif style == "hftn":
            from lidp_tpu.integrate.minimize import hftn_minimize

            dmax = float(getattr(self, "_min_modify", {}).get("dmax", 0.1))
            run_min = lambda s_: hftn_minimize(   # noqa: E731
                s_, compute, etol=etol, ftol=ftol, maxiter=maxiter,
                dmax=dmax)
        else:
            dmax = float(getattr(self, "_min_modify", {}).get("dmax", 0.1))
            run_min = lambda s_: cg_minimize(     # noqa: E731
                s_, compute, etol=etol, ftol=ftol, maxiter=maxiter,
                style=style, dmax=dmax)
        run_min = jax.jit(run_min)
        br = next((f for f in self.fixes.values()
                   if f.style == "box/relax"), None)
        sys2, e, it, conv = run_min(sim.sys)
        if br is not None:
            sys2, e = self._box_relax(sim, br, sys2, run_min, compute)
        sim.sys = sys2.replace(v=jnp.zeros_like(sys2.v))
        sim.res = None  # force re-setup on next run
        self.x = __import__("numpy").asarray(sys2.x)
        self.log(f"# minimize: E = {float(e):.8g} after {int(it)} iterations")

    def _box_relax(self, sim, br, sys2, run_min, compute):
        """fix box/relax iso|aniso|x|y|z Ptarget [vmax V]
        (fix_box_relax.cpp): relax the cell to the target pressure during
        minimization.  The reference folds the strain in as extra
        minimizer dof (min_energy/min_step); here an outer secant loop on
        P(strain) alternates full atom minimizations with vmax-capped
        affine box steps — same fixed point (P == Ptarget at an atomic
        minimum), TPU-friendly inner loop."""
        import numpy as np

        from lidp_tpu import box as box_mod

        a = list(br.args)
        p_t = [None, None, None]
        iso = False
        vmax = 0.0001
        i = 0
        while i < len(a):
            if a[i] in ("iso", "aniso"):
                iso = a[i] == "iso"
                p_t = [float(a[i + 1])] * 3
                i += 2
            elif a[i] in ("x", "y", "z"):
                p_t["xyz".index(a[i])] = float(a[i + 1])
                i += 2
            elif a[i] == "vmax":
                vmax = float(a[i + 1])
                i += 2
            else:
                i += 2
        flags = np.array([v is not None for v in p_t])
        tgt = np.array([v if v is not None else 0.0 for v in p_t])
        nktv2p = self.units.nktv2p
        dim = getattr(self, "dimension", 3)

        def press_dims(sys_):
            import jax.numpy as jnp

            from lidp_tpu.forcefield import compute_forces
            res = compute_forces(sys_, sim.runner.ff)
            v6 = np.asarray(res.virial)
            V = float(np.asarray(sys_.box.volume))
            p = v6[:3] / V * nktv2p
            return (np.full(3, p[:dim].mean()) if iso else p), float(
                res.epair)

        prev = None
        e = None
        for _ in range(400):
            p_cur, e = press_dims(sys2)
            dp = np.where(flags, p_cur - tgt, 0.0)
            if np.abs(dp).max() < max(1e-8, 1e-6 * np.abs(tgt).max()):
                break
            if prev is None:
                # probe step: expand when P > Ptarget
                ds = np.clip(np.sign(dp) * 1e-4, -vmax, vmax)
            else:
                s_prev, p_prev = prev
                dPds = (p_cur - p_prev) / np.where(
                    np.abs(s_prev) > 0, s_prev, 1.0)
                dPds = np.where(np.abs(dPds) > 1e-30, dPds, -1e30)
                ds = np.clip(-dp / dPds, -vmax, vmax)
            ds = np.where(flags, ds, 0.0)
            if iso:
                ds[:] = ds[:dim].mean()
                if dim == 2:
                    ds[2] = 0.0
            lo = np.asarray(sys2.box.lo)
            hi = np.asarray(sys2.box.hi)
            c = 0.5 * (lo + hi)
            scale = 1.0 + ds
            new_lo = c + (lo - c) * scale
            new_hi = c + (hi - c) * scale
            newbox = box_mod.Box.create(
                new_lo, new_hi, dtype=sys2.x.dtype,
                periodic=sys2.box.periodic,
                tilt=(np.asarray(sys2.box.tilt)
                      if sys2.box.tilt is not None else None),
                force_triclinic=sys2.box.triclinic)
            import jax.numpy as jnp
            x = jnp.asarray(c + (np.asarray(sys2.x) - c) * scale,
                            sys2.x.dtype)
            sys2 = sys2.replace(x=x, box=newbox)
            sys2, e, _, _ = run_min(sys2)
            prev = (ds, p_cur)
        return sys2, e

    def cmd_reset_timestep(self, a):
        self._invalidate()
        self.step = int(a[0])

    def cmd_write_restart(self, a):
        """Binary restart (write_restart.cpp:83) -> state-pytree checkpoint."""
        from lidp_tpu.utils.checkpoint import save_checkpoint

        if self._sim is None or self._sim.res is None:
            from lidp_tpu.sim import Simulation
            if self._sim is None:
                self._sim = Simulation.from_script(self)
            self._sim.sys, self._sim.res, self._sim.nlist, self._sim.istate = \
                self._sim.runner.setup(self._sim.sys)
        path = os.path.join(self.root, a[0].replace("*", str(self.step)))
        save_checkpoint(path, self._sim.sys, istate=self._sim.istate)
        self.log(f"# wrote restart {path}")

    def cmd_read_restart(self, a):
        """Restore positions/velocities/dipoles/step from a checkpoint.

        Must follow the setup commands that define the force field (the
        reference stores those in the restart; we re-derive them from the
        script, which is how all bundled inputs are structured anyway)."""
        from lidp_tpu.sim import Simulation
        from lidp_tpu.utils.checkpoint import load_checkpoint

        if self._sim is None:
            self._sim = Simulation.from_script(self)
        path = os.path.join(self.root, a[0])
        sys2, _, _ = load_checkpoint(path, self._sim.sys)
        import numpy as np

        self.x = np.asarray(sys2.x)
        self.v = np.asarray(sys2.v)
        self.step = int(sys2.step)
        self._invalidate()

    def cmd_pair_modify(self, a):
        i = 0
        while i < len(a):
            if a[i] == "shift":
                self._pair_shift = _yesno(a[i + 1]); i += 2
            elif a[i] == "mix":
                self._pair_mix = a[i + 1]; i += 2
            elif a[i] == "tail":
                self._pair_tail = _yesno(a[i + 1]); i += 2
            elif a[i] == "table":
                i += 2  # we always evaluate erfc exactly (no tables)
            else:
                i += 2

    def cmd_kspace_modify(self, a):
        i = 0
        while i < len(a):
            if a[i] == "gewald":
                self._gewald_override = float(a[i + 1]); i += 2
            elif a[i] == "gewald/disp":
                # pins g_ewald_6 (kspace.cpp modify_params gewald/disp)
                self._gewald6_override = float(a[i + 1]); i += 2
            elif a[i] == "cutoff/adjust":
                # MSM cutoff auto-adjustment (kspace.cpp:534)
                self._msm_cutoff_adjust = a[i + 1] == "yes"; i += 2
            else:
                i += 2

    # --------------------- misc top-level commands ------------------------

    def cmd_displace_atoms(self, a):
        """displace_atoms group move/ramp/random (displace_atoms.cpp:111-199)
        with units box|lattice scaling (default lattice) and periodic-dim
        remap of the results."""
        self._invalidate()
        gm = np.asarray(self.groups[a[0]], bool)
        style = a[1]
        scale = np.ones(3)
        if "units" not in a or a[a.index("units") + 1] == "lattice":
            scale = self._spacing3()
        x = np.asarray(self.x, float)
        if style == "move":
            d = scale * np.array([float(a[2]), float(a[3]), float(a[4])])
            x[gm] += d
        elif style == "ramp":
            ddim = "xyz".index(a[2])
            dlo, dhi = scale[ddim] * float(a[3]), scale[ddim] * float(a[4])
            cdim = "xyz".index(a[5])
            clo, chi = scale[cdim] * float(a[6]), scale[cdim] * float(a[7])
            frac = np.clip((x[:, cdim] - clo) / (chi - clo), 0.0, 1.0)
            x[gm, ddim] += (dlo + frac * (dhi - dlo))[gm]
        elif style == "random":
            from lidp_tpu.rng import park_geom_streams

            d = scale * np.array([float(a[2]), float(a[3]), float(a[4])])
            # coordinate-seeded streams make the result owner-independent
            # (displace_atoms.cpp:192 random->reset(seed,x[i]))
            streams = park_geom_streams(int(a[5]), x)
            disp = np.stack([d[k] * 2.0 * (streams.uniform() - 0.5)
                             for k in range(3)], axis=1)
            x[gm] += disp[gm]
        else:
            raise NotImplementedError(f"displace_atoms {style}")
        # Domain::remap on periodic dims only
        L = self.box_hi - self.box_lo
        for dim in range(3):
            if self.periodic[dim]:
                shift = np.floor((x[:, dim] - self.box_lo[dim]) / L[dim])
                x[:, dim] -= shift * L[dim]
                self.image[:, dim] += shift.astype(self.image.dtype)
        self.x = x

    def _type_list(self, tok, tmax):
        """force->bounds wildcard: N, *, N*, *M, N*M -> bool[tmax+1]."""
        sel = np.zeros(tmax + 1, bool)
        if "*" in tok:
            lo, _, hi = tok.partition("*")
            sel[int(lo) if lo else 1: (int(hi) if hi else tmax) + 1] = True
        else:
            sel[int(tok)] = True
        return sel

    def cmd_delete_bonds(self, a):
        """delete_bonds group style [type] [any/undo/remove/special]
        (delete_bonds.cpp): toggle interaction types negative (off) /
        positive (undo) or compact them out (remove).  Turned-off rows
        keep contributing to special-bond exclusions, matching the
        reference's neighbor special lists."""
        self._invalidate()
        gm = np.asarray(self.groups[a[0]], bool)
        style = a[1]
        ia = 2
        tsel = None
        if style not in ("multi", "stats"):
            ia = 3
        any_flag = "any" in a[ia:]
        undo = "undo" in a[ia:]
        remove = "remove" in a[ia:]
        stats = {}
        for fam, idx_attr, typ_attr in (
                ("bond", "_bonds", "_bond_types"),
                ("angle", "_angles", "_angle_types"),
                ("dihedral", "_dihedrals", "_dihedral_types"),
                ("improper", "_impropers", "_improper_types")):
            idx = getattr(self, idx_attr, None)
            if idx is None or not len(idx):
                continue
            typ = np.asarray(getattr(self, typ_attr), np.int64).copy()
            active = {"bond": ("bond", "multi", "atom"),
                      "angle": ("angle", "multi", "atom"),
                      "dihedral": ("dihedral", "multi", "atom"),
                      "improper": ("improper", "multi", "atom")}[fam]
            if style in active:
                ingrp = gm[np.asarray(idx, np.int64) - 1]
                consider = (ingrp.any(1) if any_flag else ingrp.all(1))
                if style == "atom":
                    tl = self._type_list(a[2], int(self.type.max()))
                    consider &= tl[self.type[
                        np.asarray(idx, np.int64) - 1]].any(1)
                elif style == fam:
                    tl = self._type_list(a[2], int(np.abs(typ).max()))
                    consider &= tl[np.abs(typ)]
                if undo:
                    flip = consider & (typ < 0)
                else:
                    flip = consider & (typ > 0)
                typ[flip] = -typ[flip]
                setattr(self, typ_attr, typ)
            if remove:
                keep = typ > 0
                setattr(self, idx_attr, np.asarray(idx)[keep])
                setattr(self, typ_attr, typ[keep])
                typ = typ[keep]
            stats[fam] = (int((typ > 0).sum()), len(typ))
        for fam, (on, tot) in stats.items():
            self.log(f"  {tot} total {fam}s, {on} turned on, "
                     f"{tot - on} turned off")

    def cmd_create_bonds(self, a):
        """create_bonds many group group btype rmin rmax |
        single/bond btype a1 a2 | single/angle atype a1 a2 a3 |
        single/dihedral dtype a1 a2 a3 a4 (create_bonds.cpp)."""
        self._invalidate()
        if getattr(self, "_bonds", None) is None:
            self._bonds = np.zeros((0, 2), np.int64)
        if getattr(self, "_bond_types", None) is None:
            self._bond_types = np.zeros(len(self._bonds), np.int64)
        if a[0] == "many":
            g1 = np.asarray(self.groups[a[1]], bool)
            g2 = np.asarray(self.groups[a[2]], bool)
            btype, rmin, rmax = int(a[3]), float(a[4]), float(a[5])
            x = np.asarray(self.x, float)
            n = len(x)
            L = self.box_hi - self.box_lo
            d = x[:, None, :] - x[None, :, :]
            for dim in range(3):
                if self.periodic[dim]:
                    d[..., dim] -= np.round(d[..., dim] / L[dim]) * L[dim]
            rsq = (d * d).sum(-1)
            hit = ((rsq >= rmin * rmin) & (rsq <= rmax * rmax)
                   & (np.arange(n)[:, None] < np.arange(n)[None, :])
                   & ((g1[:, None] & g2[None, :])
                      | (g2[:, None] & g1[None, :])))
            # skip already-bonded pairs (the reference excludes them via
            # zeroed special-1-2 neighbor masking, create_bonds.cpp:193)
            for b1, b2 in np.asarray(self._bonds, np.int64):
                hit[b1 - 1, b2 - 1] = hit[b2 - 1, b1 - 1] = False
            ii, jj = np.nonzero(hit)
            new = np.stack([ii + 1, jj + 1], 1).astype(np.int64)
            self._bonds = np.concatenate([self._bonds, new])
            self._bond_types = np.concatenate(
                [self._bond_types, np.full(len(new), btype, np.int64)])
            self.log(f"Added {len(new)} bonds, new total = "
                     f"{len(self._bonds)}")
        elif a[0] == "single/bond":
            self._bonds = np.concatenate(
                [self._bonds, [[int(a[2]), int(a[3])]]]).astype(np.int64)
            self._bond_types = np.concatenate(
                [self._bond_types, [int(a[1])]]).astype(np.int64)
        elif a[0] == "single/angle":
            if getattr(self, "_angles", None) is None or not len(
                    getattr(self, "_angles", [])):
                self._angles = np.zeros((0, 3), np.int64)
                self._angle_types = np.zeros(0, np.int64)
            self._angles = np.concatenate(
                [self._angles,
                 [[int(a[2]), int(a[3]), int(a[4])]]]).astype(np.int64)
            self._angle_types = np.concatenate(
                [self._angle_types, [int(a[1])]]).astype(np.int64)
        elif a[0] == "single/dihedral":
            if getattr(self, "_dihedrals", None) is None or not len(
                    getattr(self, "_dihedrals", [])):
                self._dihedrals = np.zeros((0, 4), np.int64)
                self._dihedral_types = np.zeros(0, np.int64)
            self._dihedrals = np.concatenate(
                [self._dihedrals,
                 [[int(a[2]), int(a[3]), int(a[4]),
                   int(a[5])]]]).astype(np.int64)
            self._dihedral_types = np.concatenate(
                [self._dihedral_types, [int(a[1])]]).astype(np.int64)
        else:
            raise NotImplementedError(f"create_bonds {a[0]}")

    def _apply_dump_frame(self, frame, fields):
        """Overwrite per-atom state from one dump frame's columns
        (read_dump.cpp::atoms): atoms matched by the id column when
        present, else file order; box updated from the frame bounds."""
        step, lo, hi, tilt, cols, data = frame
        # drop (and adopt) any live Simulation BEFORE overwriting the host
        # arrays — _invalidate copies sim state back into them
        self._invalidate()
        self.box_lo, self.box_hi = lo, hi
        if np.any(tilt != 0.0):
            self.box_tilt = tilt
        order = (np.argsort(data[:, cols.index("id")], kind="stable")
                 if "id" in cols else np.arange(len(data)))
        data = data[order]
        x = np.asarray(self.x, float)
        v = np.asarray(self.v, float)
        L = hi - lo
        for f_ in fields:
            if f_ not in cols:
                raise ValueError(f"read_dump field {f_} not in dump file")
            col = data[:, cols.index(f_)]
            if f_ in ("x", "y", "z"):
                x[:, "xyz".index(f_)] = col
            elif f_ in ("xs", "ys", "zs"):
                d = "xyz".index(f_[0])
                x[:, d] = lo[d] + col * L[d]
            elif f_ in ("vx", "vy", "vz"):
                v[:, "xyz".index(f_[1])] = col
            elif f_ == "q":
                self.q = col.copy()
            elif f_ in ("ix", "iy", "iz"):
                self.image[:, "xyz".index(f_[1])] = col.astype(
                    self.image.dtype)
            else:
                raise NotImplementedError(f"read_dump field {f_}")
        self.x, self.v = x, v
        self.step = step

    def cmd_read_dump(self, a):
        """read_dump file Nstep field1 ... [box yes|no] (read_dump.cpp)."""
        from lidp_tpu.io.dump import read_dump_frames

        path = os.path.join(self.root, a[0])
        want = int(a[1])
        fields = []
        for tok in a[2:]:
            if tok in ("box", "replace", "purge", "add", "trim", "format",
                       "wrapped", "scaled"):
                break
            fields.append(tok)
        for fr in read_dump_frames(path):
            if fr[0] == want:
                self._apply_dump_frame(fr, fields)
                return
        raise ValueError(f"read_dump: timestep {want} not in {a[0]}")

    def cmd_rerun(self, a):
        """rerun file1 [file2 ...] [first N] [last M] [every E] [skip S]
        dump field1 ... (rerun.cpp): re-evaluate forces/thermo on each
        selected snapshot."""
        from lidp_tpu.io.dump import read_dump_frames

        ikw = next((k for k, tok in enumerate(a)
                    if tok in ("first", "last", "every", "skip", "start",
                               "stop", "dump")), len(a))
        files = a[:ikw]
        first, last, every, skip = 0, 2**62, 0, 1
        i = ikw
        fields = []
        while i < len(a):
            if a[i] == "first":
                first = int(a[i + 1]); i += 2
            elif a[i] == "last":
                last = int(a[i + 1]); i += 2
            elif a[i] == "every":
                every = int(a[i + 1]); i += 2
            elif a[i] == "skip":
                skip = int(a[i + 1]); i += 2
            elif a[i] in ("start", "stop"):
                i += 2
            elif a[i] == "dump":
                fields = [t for t in a[i + 1:]
                          if t not in ("box", "wrapped", "format",
                                       "yes", "no", "native")]
                break
            else:
                i += 1
        nframe = 0
        for fpath in files:
            for fr in read_dump_frames(os.path.join(self.root, fpath)):
                if fr[0] < first or fr[0] > last:
                    continue
                if every and fr[0] % every != 0:
                    continue
                if nframe % skip != 0:
                    nframe += 1
                    continue
                nframe += 1
                self._apply_dump_frame(fr, fields)
                self._run(0)

    def cmd_change_box(self, a):
        """change_box group x/y/z|xy/xz/yz final/delta/scale ... boundary
        ... ortho|triclinic remap [units box|lattice] (change_box.cpp):
        ops applied in order; `remap` affinely maps group atoms from the
        box state saved at the start (or the previous remap) to the
        current one, then every atom re-wraps into the new periodic box."""
        self._invalidate()
        gm = np.asarray(self.groups[a[0]], bool)
        scale = (self._spacing3() if "units" not in a
                 or a[a.index("units") + 1] == "lattice" else np.ones(3))

        def hmat(lo, hi, tilt):
            L = hi - lo
            return np.array([[L[0], tilt[0], tilt[1]],
                             [0.0, L[1], tilt[2]],
                             [0.0, 0.0, L[2]]])

        lo = self.box_lo.astype(float).copy()
        hi = self.box_hi.astype(float).copy()
        tilt = np.asarray(getattr(self, "box_tilt", np.zeros(3)),
                          float).copy()
        saved = (lo.copy(), hi.copy(), tilt.copy())
        i = 1
        while i < len(a):
            tok = a[i]
            if tok in ("x", "y", "z"):
                d = "xyz".index(tok)
                fl = a[i + 1]
                if fl == "final":
                    lo[d] = scale[d] * float(a[i + 2])
                    hi[d] = scale[d] * float(a[i + 3])
                    i += 4
                elif fl == "delta":
                    lo[d] += scale[d] * float(a[i + 2])
                    hi[d] += scale[d] * float(a[i + 3])
                    i += 4
                elif fl == "scale":
                    s = float(a[i + 2])
                    mid = 0.5 * (lo[d] + hi[d])
                    lo[d] = mid + s * (lo[d] - mid)
                    hi[d] = mid + s * (hi[d] - mid)
                    i += 3
                else:
                    raise NotImplementedError(f"change_box {tok} {fl}")
            elif tok in ("xy", "xz", "yz"):
                d = ("xy", "xz", "yz").index(tok)
                sdim = 0 if tok in ("xy", "xz") else 1
                fl = a[i + 1]
                if fl == "final":
                    tilt[d] = scale[sdim] * float(a[i + 2])
                elif fl == "delta":
                    tilt[d] += scale[sdim] * float(a[i + 2])
                else:
                    raise NotImplementedError(f"change_box {tok} {fl}")
                i += 3
            elif tok == "boundary":
                self.cmd_boundary(a[i + 1:i + 4])
                i += 4
            elif tok in ("ortho", "triclinic"):
                if tok == "ortho" and np.any(tilt != 0.0):
                    raise ValueError("cannot change to orthogonal "
                                     "when tilt is non-zero")
                i += 1
            elif tok == "remap":
                h_old = hmat(*saved)
                h_new = hmat(lo, hi, tilt)
                lam = np.linalg.solve(
                    h_old, (np.asarray(self.x, float) - saved[0]).T).T
                xg = lam @ h_new.T + lo
                self.x = np.where(gm[:, None], xg, self.x)
                saved = (lo.copy(), hi.copy(), tilt.copy())
                i += 1
            elif tok == "units":
                i += 2
            else:
                raise NotImplementedError(f"change_box {tok}")
        self.box_lo, self.box_hi = lo, hi
        self.box_tilt = tilt
        # Domain::remap wrap of every atom into the new periodic box
        x = np.asarray(self.x, float)
        h_new = hmat(lo, hi, tilt)
        lam = np.linalg.solve(h_new, (x - lo).T).T
        for d in range(3):
            if self.periodic[d]:
                shift = np.floor(lam[:, d])
                lam[:, d] -= shift
                self.image[:, d] += shift.astype(self.image.dtype)
        self.x = lam @ h_new.T + lo

    def cmd_balance(self, a):
        """balance thresh style ... [weight ...] (balance.cpp, rcb.cpp,
        imbalance_*.cpp): composes per-atom weights (group/neigh/var/
        store, reference multiply-into-1.0 semantics) and repartitions.

        The GSPMD engine shards the atom axis in equal index blocks (a
        hard SPMD requirement), so the repartition degree of freedom is
        the ROW PERMUTATION: a weighted LPT assignment
        (parallel/balance.balanced_permutation) reorders atoms so every
        block carries near-equal weight; `rcb` additionally computes the
        reference's recursive-coordinate-bisection assignment for the
        reported cut quality.  The permutation is stored on
        `self.shard_perm` (consumed by the shard-load probe; the padded
        dense panels are permutation-invariant in wall clock, measured in
        scripts/shard_load_probe.py)."""
        import numpy as _np

        from lidp_tpu.parallel import balance as _bal

        ndev = max(1, self.n_shard_devices)
        n = len(self.x) if self.x is not None else 0
        if n == 0:
            self.log("  iteration count = 0")
            self.log("  initial/final imbalance factor = 1 1")
            return
        # grammar: thresh, then style tokens, then keyword sections;
        # fix balance prepends Nevery, so strip up to two leading numbers
        toks = list(a)
        for _ in range(2):
            try:
                float(toks[0])
                toks = toks[1:]
            except (ValueError, IndexError):
                break
        style = "shift"
        weights = _np.ones(n)
        niter = 0
        group_msg = None
        i = 0
        while i < len(toks):
            t = toks[i]
            if t in ("x", "y", "z"):
                # x uniform | x N c1 c2 ... — explicit brick cuts; the
                # index-blocked layout has no brick cuts, accepted
                i += 1
                if i < len(toks) and toks[i] == "uniform":
                    i += 1
                else:
                    while i < len(toks):
                        try:
                            float(toks[i])
                            i += 1
                        except ValueError:
                            break
            elif t == "shift":
                style = "shift"
                niter = int(toks[i + 2])
                i += 4   # shift dimstr Niter stopthresh
            elif t == "rcb":
                style = "rcb"
                i += 1
            elif t == "weight":
                w_style, i = toks[i + 1], i + 2
                if w_style == "group":
                    num = int(toks[i]); i += 1
                    parts = []
                    for _ in range(num):
                        g, f = toks[i], float(toks[i + 1]); i += 2
                        if g not in self.groups:
                            raise ValueError(
                                "Unknown group in balance weight command")
                        if f <= 0:
                            raise ValueError(
                                "Illegal balance weight command")
                        weights = weights * _np.where(
                            _np.asarray(self.groups[g], bool), f, 1.0)
                        parts.append(f"{g}={f:g}")
                    group_msg = "  group weights: " + " ".join(parts)
                elif w_style == "neigh":
                    factor = float(toks[i]); i += 1
                    cutmax = self._max_pair_cutoff() + self.skin
                    counts = _bal.neigh_counts(
                        self.x, self.box_lo, self.box_hi, cutmax,
                        tilt=getattr(self, "box_tilt", None))
                    w = _bal.apply_factor(counts.astype(float), factor)
                    if (w <= 0).any():
                        w = _np.maximum(w, 1e-12)
                    weights = weights * w
                elif w_style == "time":
                    i += 1   # factor: no per-atom timing data — uniform
                    self.log("  balance weight time: uniform "
                             "(per-atom timers n/a on the fused TPU step)")
                elif w_style == "var":
                    name = toks[i]; i += 1
                    if name not in getattr(self, "_atom_exprs", {}):
                        raise ValueError("Variable name for balance "
                                         "weight does not exist")
                    vals = self.evaluate_atom_expr(self._atom_exprs[name])
                    vals = _np.broadcast_to(
                        _np.asarray(vals, float), (n,)).copy()
                    if (vals <= 0).any():
                        raise ValueError("Balance weight <= 0.0")
                    weights = weights * vals
                elif w_style == "store":
                    name = toks[i]; i += 1
                    if not hasattr(self, "balance_store"):
                        self.balance_store = {}
                    self.balance_store[name] = weights
                else:
                    raise ValueError(
                        "Unknown (fix) balance weight method")
            elif t == "out":
                i += 2   # out filename: brick-cut grid file, n/a
            else:
                i += 1
        imb0 = _bal.imbalance_factor(
            weights, _bal.block_assignment(n, ndev), ndev)
        perm = _bal.balanced_permutation(weights, ndev)
        assign = _bal.block_assignment(n, ndev, perm)
        if style == "rcb":
            # the reference's spatial bisection, reported for parity; the
            # executed layout is the index-blocked permutation
            rcb = _bal.rcb_assign(self.x, weights, ndev,
                                  self.box_lo, self.box_hi)
            imb_rcb = _bal.imbalance_factor(weights, rcb, ndev)
            self.log(f"  rcb imbalance factor = {imb_rcb:.6g}")
        imb1 = _bal.imbalance_factor(weights, assign, ndev)
        self.shard_perm = perm if ndev > 1 else None
        cost = _np.bincount(assign, weights=weights, minlength=ndev)
        cost0 = _np.bincount(_bal.block_assignment(n, ndev),
                             weights=weights, minlength=ndev)
        self.log(f"  iteration count = {niter if style == 'shift' else 1}")
        if group_msg:
            self.log(group_msg)
        self.log(f"  initial/final max load/proc = "
                 f"{cost0.max():g} {cost.max():g}")
        self.log(f"  initial/final imbalance factor = "
                 f"{imb0:.6g} {imb1:.6g}")
        if ndev > 1:
            # the executed GSPMD layout keeps index blocks; the permuted
            # layout is realized only by consumers of shard_perm (the
            # shard-load probe) — the masked-dense panels are
            # permutation-invariant in wall clock, so the engine does not
            # reorder live per-atom state (and topology index remaps)
            self.log("  (final factor is the projected shard_perm layout; "
                     "executed dense panels are permutation-invariant)")

    def _max_pair_cutoff(self) -> float:
        cut = 0.0
        if getattr(self, "pair", None) is not None:
            cut = float(getattr(self.pair, "cut_lj_global", 0.0) or 0.0)
            cut = max(cut, float(getattr(self.pair, "cut_coul", 0.0) or 0.0))
        # every cmd_pair_coeff storage path normalizes the tuple so the
        # LAST element is the per-pair cutoff (global cut_lj when the style
        # takes none, e.g. charmm) — scanning all numeric tails would treat
        # eps14/sigma14 or large sigmas as cutoffs
        for v in getattr(self, "pair_coeffs", {}).values():
            if v and isinstance(v[-1], (int, float)):
                cut = max(cut, float(v[-1]))
        return cut or 2.5

    def cmd_molecule(self, a):
        """molecule ID file (molecule.cpp): parse a molecule template —
        header counts + Coords/Types/Charges/Bonds/Angles/Dihedrals/
        Impropers sections; dx = coords relative to the mean center
        (Molecule::compute_center)."""
        mid = a[0]
        path = os.path.join(self.root, a[1])
        mol = {"x": [], "type": [], "q": [], "bonds": [], "angles": [],
               "dihedrals": [], "impropers": []}
        sec = None
        counts = {}
        with open(path) as fh:
            lines = fh.readlines()
        i = 1   # first line is a comment
        secnames = {"Coords": "x", "Types": "type", "Charges": "q",
                    "Bonds": "bonds", "Angles": "angles",
                    "Dihedrals": "dihedrals", "Impropers": "impropers"}
        while i < len(lines):
            ln = lines[i].split("#")[0].strip()
            i += 1
            if not ln:
                continue
            toks = ln.split()
            if toks[-1] in ("atoms", "bonds", "angles", "dihedrals",
                            "impropers") and len(toks) == 2:
                counts[toks[1]] = int(toks[0])
                continue
            if toks[0] in secnames:
                sec = secnames[toks[0]]
                continue
            if ln in ("Special Bond Counts", "Special Bonds", "Masses",
                      "Diameters", "Shake Flags", "Shake Atoms",
                      "Shake Bond Types"):
                sec = "skip"
                continue
            if sec == "skip" or sec is None:
                continue
            if sec == "x":
                mol["x"].append([float(v) for v in toks[1:4]])
            elif sec == "type":
                mol["type"].append(int(toks[1]))
            elif sec == "q":
                mol["q"].append(float(toks[1]))
            else:
                mol[sec].append([int(v) for v in toks[1:]])
        x = np.asarray(mol["x"], float)
        center = x.mean(0)
        mol["dx"] = x - center
        mol["x"] = x
        mol["type"] = np.asarray(mol["type"], np.int32)
        mol["q"] = np.asarray(mol["q"] or [0.0] * len(x), float)
        if not hasattr(self, "molecules"):
            self.molecules = {}
        self.molecules[mid] = mol
        self.log(f"Read molecule {mid}: {len(x)} atoms, "
                 f"{len(mol['bonds'])} bonds, {len(mol['angles'])} angles")

    def _insert_molecules(self, centers, ntype, mid, seed):
        """create_atoms ... mol ID seed (create_atoms.cpp add_molecule):
        one randomly rotated copy per site, RanMars rotation stream
        bit-exact (random axis + angle -> quaternion -> rotation)."""
        from lidp_tpu.rng import RanMars

        mol = self.molecules[mid]
        rng_ = RanMars(seed)
        nm = len(mol["dx"])
        xs, tys, qs = [], [], []
        bonds, btyps = [], []
        angles, atyps = [], []
        dihedrals, dtyps = [], []
        impropers, ityps = [], []
        n0 = 0 if self.x is None else len(self.x)
        maxmol = (int(self.mol.max()) if self.mol is not None
                  and len(self.mol) else 0)
        dim3 = self.dimension == 3
        for k, cen in enumerate(centers):
            if dim3:
                r = np.array([rng_.uniform() - 0.5, rng_.uniform() - 0.5,
                              rng_.uniform() - 0.5])
            else:
                r = np.array([0.0, 0.0, 1.0])
            r /= np.linalg.norm(r)
            theta = rng_.uniform() * 2.0 * np.pi
            # MathExtra::axisangle_to_quat + quat_to_mat
            w = np.cos(0.5 * theta)
            s = np.sin(0.5 * theta)
            qv = r * s
            w2, i2, j2, k2 = w * w, qv[0] ** 2, qv[1] ** 2, qv[2] ** 2
            tij, tik, tjk = (2 * qv[0] * qv[1], 2 * qv[0] * qv[2],
                             2 * qv[1] * qv[2])
            twi, twj, twk = 2 * w * qv[0], 2 * w * qv[1], 2 * w * qv[2]
            rot = np.array([
                [w2 + i2 - j2 - k2, tij - twk, tik + twj],
                [tij + twk, w2 - i2 + j2 - k2, tjk - twi],
                [tik - twj, tjk + twi, w2 - i2 - j2 + k2]])
            xs.append(mol["dx"] @ rot.T + cen)
            tys.append(ntype + mol["type"])
            qs.append(mol["q"])
            off = n0 + k * nm
            for row, tlist, sec in ((bonds, btyps, "bonds"),
                                    (angles, atyps, "angles"),
                                    (dihedrals, dtyps, "dihedrals"),
                                    (impropers, ityps, "impropers")):
                for b in mol[sec]:
                    tlist.append(b[0])
                    row.append([v + off for v in b[1:]])
        nnew = len(centers) * nm
        x = np.concatenate(xs)
        molid = maxmol + 1 + np.repeat(np.arange(len(centers)), nm)
        if self.x is None or not len(self.x):
            self.x = x
            self.v = np.zeros((nnew, 3))
            self.q = np.concatenate(qs)
            self.type = np.concatenate(tys).astype(np.int32)
            self.mol = molid.astype(np.int32)
            self.image = np.zeros((nnew, 3), np.int32)
            self.groups = {"all": np.ones(nnew, bool)}
        else:
            self.x = np.concatenate([self.x, x])
            self.v = np.concatenate([self.v, np.zeros((nnew, 3))])
            self.q = np.concatenate([self.q, np.concatenate(qs)])
            self.type = np.concatenate(
                [self.type, np.concatenate(tys)]).astype(np.int32)
            self.mol = np.concatenate([self.mol, molid]).astype(np.int32)
            self.image = np.concatenate(
                [self.image, np.zeros((nnew, 3), np.int32)])
            self.groups = {kk: np.concatenate(
                [np.asarray(vv), np.full(nnew, kk == "all", bool)])
                for kk, vv in self.groups.items()}
        for attr, tattr, rows, tl, w in (
                ("_bonds", "_bond_types", bonds, btyps, 2),
                ("_angles", "_angle_types", angles, atyps, 3),
                ("_dihedrals", "_dihedral_types", dihedrals, dtyps, 4),
                ("_impropers", "_improper_types", impropers, ityps, 5)):
            if not rows:
                continue
            old = getattr(self, attr, None)
            oldt = getattr(self, tattr, None)
            new = np.asarray(rows, np.int64)
            newt = np.asarray(tl, np.int64)
            if old is None or not len(old):
                setattr(self, attr, new)
                setattr(self, tattr, newt)
            else:
                setattr(self, attr, np.concatenate([old, new]))
                setattr(self, tattr, np.concatenate(
                    [np.asarray(oldt, np.int64), newt]))
        self.log(f"Created {nnew} atoms ({len(centers)} molecules)")

    def cmd_uncompute(self, a):
        self.computes.pop(a[0], None)
        self._invalidate()

    def cmd_compute_modify(self, a):
        """compute_modify ID extra/dynamic (compute.cpp modify_params):
        extra overrides the dof subtracted by temperature computes."""
        if not hasattr(self, "_compute_modify"):
            self._compute_modify = {}
        d = self._compute_modify.setdefault(a[0], {})
        i = 1
        while i < len(a):
            d[a[i]] = a[i + 1]
            i += 2
        self._invalidate()

    def cmd_min_modify(self, a):
        """min_modify dmax/line (min.cpp modify_params) — stored; the
        CG/SD line search caps trial steps at dmax."""
        if not hasattr(self, "_min_modify"):
            self._min_modify = {}
        i = 0
        while i < len(a):
            self._min_modify[a[i]] = a[i + 1]
            i += 2

    def cmd_clear(self, a):
        """clear (input.cpp:629): wipe the system, keep log/echo state."""
        self.__init__(root=self.root, dtype=self.dtype, log=self.log,
                      thermo_callback=self.thermo_callback,
                      speed_mode=self.speed_mode)

    def cmd_quit(self, a):
        raise SystemExit(0)

    def cmd_shell(self, a):
        """shell cd/mkdir/rm/putenv or an arbitrary command (input.cpp)."""
        import subprocess

        if a[0] == "cd":
            self.root = os.path.abspath(os.path.join(self.root, a[1]))
        elif a[0] == "mkdir":
            for p in a[1:]:
                os.makedirs(os.path.join(self.root, p), exist_ok=True)
        elif a[0] == "putenv":
            for kv in a[1:]:
                k, _, v = kv.partition("=")
                os.environ[k] = v
        else:
            subprocess.run(" ".join(a), shell=True, cwd=self.root)

    def cmd_restart(self, a):
        """restart N file [file2] (output.cpp): periodic checkpoints at
        run-chunk boundaries (every N steps; * -> timestep)."""
        self._restart_every = int(a[0])
        self._restart_files = list(a[1:]) or ["restart.*"]

    def cmd_dielectric(self, a):
        """dielectric N (input.cpp/force.cpp): scales qqrd2e by 1/eps."""
        self.dielectric = float(a[0])
        self._invalidate()

    def cmd_box(self, a):
        # box tilt large|small (domain.cpp box_change): we never restrict
        # tilt factors, so both settings are accepted
        pass

    def cmd_comm_style(self, a):
        # brick/tiled choose the MPI decomposition; GSPMD sharding is the
        # analog and is controlled by `processors`
        pass

    def cmd_suffix(self, a):
        # accelerator-variant suffixes (suffix.h); XLA compiles the one
        # TPU path — accepted as a no-op
        pass

    def cmd_package(self, a):
        # package gpu/omp/intel runtime knobs — n/a on the XLA backend
        pass

    def cmd_partition(self, a):
        """partition yes|no N command... (input.cpp:584): run a command on
        a subset of partitions.  The vmapped replica axis is the universe
        analog; world-variable scripts drive per-replica state instead, so
        apply the command when partition 1 is in the selection."""
        sel = a[1]
        ok = ("*" in sel or "1" == sel or sel.startswith("1*")
              or "*1" == sel)
        if a[0] == "no":
            ok = not ok
        if ok:
            self.one(" ".join(a[2:]))

    def cmd_info(self, a):
        """info categories (info.cpp) — system summary to the log."""
        n = len(self.x) if self.x is not None else 0
        b = getattr(self, "_bonds", None)
        self.log(f"Info: {n} atoms, "
                 f"{0 if b is None else len(b)} bonds, "
                 f"units {self.units}, "
                 f"{len(self.fixes)} fixes, {len(self.computes)} computes")
        self.log(f"Info: box {self.box_lo} to {self.box_hi}")

    def cmd_bond_write(self, a):
        """bond_write btype N inner outer file keyword [itype jtype]
        (Bond::write_file, bond.cpp:223): tabulate (i, r, E, F) rows of
        the current bond style in bond_style-table format."""
        import jax
        import jax.numpy as jnp

        from lidp_tpu.ops.bonded import bond_forces
        from lidp_tpu.styles.bonded_builders import _bond_params_one
        from lidp_tpu.box import Box

        btype, n_ = int(a[0]), int(a[1])
        inner, outer = float(a[2]), float(a[3])
        if inner <= 0.0 or inner >= outer:
            raise ValueError("Invalid rlo/rhi values in bond_write")
        path = os.path.join(self.root, a[4])
        keyword = a[5]
        TB = max(self.bond_coeffs.keys(), default=0)
        p = _bond_params_one(
            self.bond_style, self.bond_coeffs,
            np.array([[0, 1]], np.int64), np.array([btype], np.int64),
            TB, self.dtype, self, None, self.root)
        big = 4.0 * outer
        box = Box.create(np.zeros(3), np.full(3, big), dtype=self.dtype)

        def efr(r):
            x = jnp.zeros((2, 3), self.dtype).at[1, 0].set(r)
            f, e, _ = bond_forces(x, box, p)
            # table convention: F = fbond*r, positive = repulsive
            # (bond.cpp:279 single() returns f/r along r_ij)
            return e, f[1, 0]

        rs = inner + (outer - inner) * np.arange(n_) / (n_ - 1)
        es, fs = jax.vmap(efr)(jnp.asarray(rs, self.dtype))
        es, fs = np.asarray(es), np.asarray(fs)
        # equilibrium distance for the header (Bond::equilibrium_distance)
        co = self.bond_coeffs[btype]
        r0 = {"harmonic": lambda: float(co[1]),
              "morse": lambda: float(co[2]),
              "nonlinear": lambda: float(co[1]),
              "gromos": lambda: float(co[1]),
              "class2": lambda: float(co[0]),
              "fene": lambda: 0.97 * float(co[3]),
              "fene/expand": lambda: 0.97 * float(co[3]) + float(co[4]),
              }.get(self.bond_style, lambda: rs[int(np.argmin(es))])()
        with open(path, "a") as fh:
            fh.write(f"# Bond potential {self.bond_style} for bond type "
                     f"{btype}: i,r,energy,force\n")
            fh.write(f"\n{keyword}\nN {n_} EQ {r0:.15g}\n\n")
            for i in range(n_):
                fh.write(f"{i+1} {rs[i]:.15g} {es[i]:.15g} {fs[i]:.15g}\n")

    def cmd_python(self, a):
        """python command (python.cpp): the reference embeds a Python
        interpreter to define functions callable from variables; this
        engine IS Python — use the lidp_tpu.api module instead."""
        raise NotImplementedError(
            "the python command is superseded by the native Python API "
            "(lidp_tpu.api.lammps / PyLammps)")

    def cmd_write_coeff(self, a):
        """write_coeff file (write_coeff.cpp): dump the *_coeff settings
        in input-script form."""
        path = os.path.join(self.root, a[0])
        with open(path, "w") as fh:
            if self.pair.name:
                fh.write(f"# pair_style {self.pair.name}\n")
            for (i, j), co in sorted(self.pair_coeffs.items()):
                fh.write("pair_coeff %d %d %s\n"
                         % (i, j, " ".join("%.16g" % c if isinstance(
                             c, float) else str(c) for c in co)))
            for fam in ("bond", "angle", "dihedral", "improper"):
                for t, co in sorted(getattr(self, f"{fam}_coeffs",
                                            {}).items()):
                    fh.write(f"{fam}_coeff %s %s\n"
                             % (t, " ".join(map(str, co))))

    # ------------------------- simulation assembly -------------------------

    def _run(self, nsteps: int):
        from lidp_tpu.sim import Simulation

        if self._sim is None:
            self._sim = Simulation.from_script(self)
        # update->beginstep/endstep for the time-family variable functions
        # (ramp/vdisplace/swiggle/elapsed — run.cpp sets these before
        # integrating; `run N` spans [step, step+N]).  A restart-segmented
        # run (cmd_run) pre-sets the FULL span; don't shrink it here.
        if not self._in_run:
            self._run_begin = int(self.step)
            self._run_end = int(self.step) + int(nsteps)
        self._in_run = True
        try:
            self._sim.run(nsteps)
        finally:
            self._in_run = False


class _ExprCtx:
    """Evaluation context adapter: lidp_tpu.io.expr <-> LammpsScript.
    Implements the callbacks the expression engine needs (thermo
    keywords, variable refs, group/special functions, atom vectors,
    persistent random streams) against the script's host state —
    the Variable::evaluate environment (variable.cpp:1168)."""

    def __init__(self, script):
        self.s = script

    # --- run/time context ---
    @property
    def natoms(self):
        return 0 if self.s.x is None else len(self.s.x)

    @property
    def step(self):
        row = self.s._kw_row
        if row is not None and "step" in row:
            return int(row["step"])
        return int(self.s.step)

    @property
    def dt(self):
        return float(self.s.dt)

    @property
    def in_run(self):
        return bool(self.s._in_run)

    @property
    def run_begin(self):
        return int(self.s._run_begin)

    @property
    def run_end(self):
        return int(self.s._run_end)

    # --- scalar sources ---
    def thermo(self, word):
        return self.s._thermo_keyword(word)

    def var_ref(self, name, mode):
        s = self.s
        if name in s._atom_exprs:
            if mode is None:
                raise ValueError(
                    f"atom-style variable {name} in equal-style formula")
            arr = s.evaluate_atom_expr(s._atom_exprs[name])
            return arr if mode == "vec" else float(arr[mode])
        return s.var_value(name)

    def compute_ref(self, cid, i1, i2, mode):
        key = f"c_{cid}"
        if i1 is not None:
            key += f"[{i1}]"
        if i2 is not None:
            key += f"[{i2}]"
        row = self.s._current_thermo_row()
        if row is not None and key in row:
            return float(row[key])
        raise ValueError(f"compute reference {key} not available in "
                         "variable formula (no live value)")

    def fix_ref(self, fid, i1, i2, mode):
        key = f"f_{fid}"
        if i1 is not None:
            key += f"[{i1}]"
        row = self.s._current_thermo_row()
        if row is not None and key in row:
            return float(row[key])
        raise ValueError(f"fix reference {key} not available in "
                         "variable formula (no live value)")

    # --- atom data ---
    def atom_vec(self, word):
        s = self.s
        n = self.natoms
        if word == "id":
            return np.arange(1, n + 1, dtype=float)
        if word == "mass":
            return s.mass_type[s.type].astype(float)
        if word == "type":
            return np.asarray(s.type, float)
        if word == "mol":
            return np.asarray(s.mol, float)
        if word == "q":
            return np.asarray(s.q, float)
        if word in ("x", "y", "z"):
            return np.asarray(s.x, float)[:, "xyz".index(word)]
        if word in ("vx", "vy", "vz"):
            return np.asarray(s.v, float)[:, "xyz".index(word[1])]
        if word in ("fx", "fy", "fz"):
            sim = s._sim
            if sim is not None and sim.res is not None:
                return np.asarray(sim.res.f, float)[:n, "xyz".index(word[1])]
            return np.zeros(n)
        raise ValueError(f"unknown atom vector {word!r}")

    def group_mask(self, name):
        return np.asarray(self.s.groups[name], bool)

    def region_mask(self, name):
        return np.asarray(self.s._region_mask(name), bool)

    # --- group functions (variable.cpp:3669-3911) ---
    def group_func(self, word, raw):
        s = self.s
        gm = self.group_mask(raw[0])
        if len(raw) > 2 and raw[1].startswith("region"):
            raise NotImplementedError("group function region arg")
        m = s.mass_type[s.type].astype(float)[gm]
        x = np.asarray(s.x, float)[gm]
        v = np.asarray(s.v, float)[gm]
        if word == "count":
            return float(gm.sum())
        if word == "mass":
            return float(m.sum())
        if word == "charge":
            return float(np.asarray(s.q, float)[gm].sum())
        if word == "ke":
            u = s.units
            return float(0.5 * u.mvv2e * (m[:, None] * v * v).sum())
        # unwrapped coordinates for xcm/gyration/angmom/... (group.cpp
        # uses image-corrected positions)
        img = getattr(s, "image", None)
        if img is not None and s.box_lo is not None:
            L = (s.box_hi - s.box_lo).astype(float)
            x = x + np.asarray(img, float)[gm] * L[None, :]
        M = m.sum()
        xcm = (m[:, None] * x).sum(0) / M
        dim = {"x": 0, "y": 1, "z": 2}
        if word == "xcm":
            return float(xcm[dim[raw[1]]])
        if word == "vcm":
            vcm = (m[:, None] * v).sum(0) / M
            return float(vcm[dim[raw[1]]])
        if word == "fcm":
            f = self._forces()[gm]
            return float(f.sum(0)[dim[raw[1]]])
        if word == "bound":
            # bound(group,xmin|xmax|ymin|...) on WRAPPED coords
            col = np.asarray(s.x, float)[gm][:, dim[raw[1][0]]]
            return float(col.min() if raw[1].endswith("min")
                         else col.max())
        if word == "gyration":
            d2 = ((x - xcm) ** 2).sum(1)
            return float(np.sqrt((m * d2).sum() / M))
        if word == "angmom":
            dx = x - xcm
            vcm = (m[:, None] * v).sum(0) / M
            dv = v - vcm
            lmom = (m[:, None] * np.cross(dx, dv)).sum(0)
            return float(lmom[dim[raw[1]]])
        if word == "torque":
            dx = x - xcm
            f = self._forces()[gm]
            tq = np.cross(dx, f).sum(0)
            return float(tq[dim[raw[1]]])
        if word == "inertia":
            dx = x - xcm
            comp = raw[1]
            pairs = {"xx": (1, 2), "yy": (0, 2), "zz": (0, 1)}
            if comp in pairs:
                a, b = pairs[comp]
                return float((m * (dx[:, a] ** 2 + dx[:, b] ** 2)).sum())
            off = {"xy": (0, 1), "yz": (1, 2), "xz": (0, 2)}[comp]
            return float(-(m * dx[:, off[0]] * dx[:, off[1]]).sum())
        if word == "omega":
            # omega = I^-1 L about the COM (group.cpp omega)
            dx = x - xcm
            vcm = (m[:, None] * v).sum(0) / M
            lmom = (m[:, None] * np.cross(dx, v - vcm)).sum(0)
            ione = np.zeros((3, 3))
            for a in range(3):
                for b in range(3):
                    if a == b:
                        o1, o2 = (a + 1) % 3, (a + 2) % 3
                        ione[a, a] = (m * (dx[:, o1] ** 2
                                           + dx[:, o2] ** 2)).sum()
                    else:
                        ione[a, b] = -(m * dx[:, a] * dx[:, b]).sum()
            w = np.linalg.solve(ione, lmom)
            return float(w[dim[raw[1]]])
        raise NotImplementedError(f"group function {word!r}")

    def _forces(self):
        sim = self.s._sim
        n = self.natoms
        if sim is not None and sim.res is not None:
            return np.asarray(sim.res.f, float)[:n]
        return np.zeros((n, 3))

    # --- special functions ---
    def special_vector(self, tok):
        m = re.match(r"^([cfv])_(\w+)$", tok)
        if not m:
            raise ValueError(f"invalid vector reference {tok!r}")
        # fix vector: the growing time series IS the global vector
        # (fix_vector.cpp compute_vector; in.msd.2d's slope(f_9))
        if m.group(1) == "f":
            spec = self.s.fixes.get(m.group(2))
            if spec is not None and spec.style == "vector":
                buf = getattr(spec, "_series", None)
                if not buf:
                    raise ValueError(
                        f"fix vector {m.group(2)} has no values yet")
                return np.asarray(buf, float)
        row = self.s._current_thermo_row()
        if row is None:
            raise ValueError("no live values for vector special function")
        prefix = {"c": "c_", "f": "f_", "v": "v_"}[m.group(1)]
        key = prefix + m.group(2)
        vals = []
        i = 1
        while f"{key}[{i}]" in row:
            vals.append(float(row[f"{key}[{i}]"]))
            i += 1
        if not vals:
            raise ValueError(f"vector reference {tok!r} has no values")
        return np.asarray(vals)

    def random_source(self, seed, atom):
        s = self.s
        if atom:
            if s._rng_atom is None:
                from lidp_tpu.rng import RanMars
                s._rng_atom = RanMars(seed)
            return s._rng_atom
        if s._rng_equal is None:
            from lidp_tpu.rng import RanMars
            s._rng_equal = RanMars(seed)
        return s._rng_equal

    def var_next(self, names):
        # next(v): return current value, then advance (variable.cpp
        # special next); advancing deletes exhausted variables
        s = self.s
        vals = [s.var_value(n) for n in names]
        for n in names:
            seq = s._index_values.get(n)
            if seq is not None and s.variables.get(n) in seq[:-1]:
                i = seq.index(s.variables[n])
                s.variables[n] = seq[i + 1]
            else:
                s.variables.pop(n, None)
                s._index_values.pop(n, None)
        return vals[0]

    def is_defined(self, raw):
        if len(raw) != 2:
            raise ValueError("is_defined(category,id) needs 2 args")
        cat, ident = raw
        s = self.s
        if cat == "variable":
            return float(ident in s.variables or ident in s._equal_exprs
                         or ident in s._atom_exprs
                         or ident in s._internal_vars)
        if cat == "compute":
            return float(ident in getattr(s, "computes", {}))
        if cat == "fix":
            return float(ident in s.fixes)
        if cat == "dump":
            return float(ident in s.dumps)
        return 0.0

    def is_active(self, name, raw):
        raise NotImplementedError(f"{name}() special function")
