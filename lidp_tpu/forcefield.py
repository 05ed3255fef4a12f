"""Force-field composition: all force terms -> total forces, energies, virial.

The TPU analog of Verlet::run's force phase (verlet.cpp:300-337): pair term
(LJ + real-space Ewald), reciprocal Ewald, and the polarization module run as
one fused jitted computation; LAMMPS "styles" become composable pure functions
whose results are summed here.

Energy bookkeeping mirrors the reference tallies so thermo columns match:
evdwl/ecoul from the pair kernel (ev_tally, pair.cpp:854), elong from kspace,
epol = u_self + u_ef + u_dd from the polarization module
(force->pair->eng_pol, ...polarization.cpp:641).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from lidp_tpu.ops import ewald as ewald_ops
from lidp_tpu.ops import pair as pair_ops
from lidp_tpu.ops import polarization as pol_ops
from lidp_tpu.ops.neighbor import NeighborList, neighbor_pair_forces
from lidp_tpu.state import System


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ForceField:
    pair: Optional[pair_ops.PairParams]
    ewald: Optional[ewald_ops.EwaldParams] = None
    polar: Optional[pol_ops.PolarizationSettings] = dataclasses.field(
        metadata=dict(static=True), default=None)
    sp_code: Optional[jax.Array] = None     # (N,N) int8 special-bond level codes
    bond: Optional[object] = None           # ops.bonded.BondParams
    angle: Optional[object] = None          # ops.bonded.AngleParams
    dihedral: Optional[object] = None       # ops.bonded.DihedralParams
    improper: Optional[object] = None       # ops.bonded.ImproperParams
    pppm: Optional[object] = None           # ops.pppm.PPPMParams
    eam: Optional[object] = None            # ops.eam.EAMParams
    sp_idx: Optional[jax.Array] = None      # (N,S) sparse special lists
    sp_lvl: Optional[jax.Array] = None      # (N,S)
    qqrd2e: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    # validation switch: serial Gauss-Seidel reference solver instead of Jacobi
    reference_gs: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # recompute k-space coefficients from the (traced) box every call —
    # needed under a barostat (fix_nh.cpp:877 force->kspace->setup())
    # fix adapt pair ... a * * v_RAMP (fix_adapt.cpp): the soft-potential
    # prefactor table follows a per-run linear ramp; window set per run
    adapt: tuple = dataclasses.field(metadata=dict(static=True),
                                     default=None)
    adapt_window: object = None     # (2,) int32 [begin, end]
    kspace_dynamic: bool = dataclasses.field(metadata=dict(static=True),
                                             default=False)
    # (N,3) static shift mapping our coordinates onto the reference's STORED
    # (read_data-remapped, wrapped-at-last-rebuild) positions, used only by
    # the polar fdotr virial tally (see dipole_forces_energy)
    polar_xshift: Optional[jax.Array] = None
    # TIP4P off-site charge params (ops.tip4p.TIP4PParams); when set, the
    # pair params carry LJ only (coul=False) and the coulomb (real + recip)
    # runs on charge-site positions with affine force redistribution
    tip4p: Optional[object] = None
    # True for the MOLECULE tip4p/cut family (pair_tip4p_cut.cpp /
    # pair_lj_cut_tip4p_cut.cpp): bare cutoff Coulomb on charge sites,
    # no k-space term
    tip4p_cut: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)
    # geometric-dispersion k-space (pair lj/long/coul/long + ewald/disp
    # func[1]): per-mode tables + per-atom B_i = sqrt(4 eps sig^6)
    ewald6: Optional[ewald_ops.Ewald6Params] = None
    b_atom: Optional[jax.Array] = None
    # mesh variant of the same dispersion sum (kspace pppm/disp,
    # pppm_disp.cpp geometric branch); shares b_atom
    pppm_disp: Optional[object] = None      # ops.pppm.PPPMDispParams
    # multilevel summation (kspace msm; ops/msm.py)
    msm: Optional[object] = None            # ops.msm.MSMParams
    # pair_style hybrid[/overlay] sub-styles beyond the first: each is a
    # fully-masked kernel pass summed in compute_forces (the XLA-native
    # replacement for pair_hybrid.cpp's per-pair map_style indirection)
    extra_pairs: tuple = ()                 # tuple[PairParams, ...]
    # dissipative particle dynamics (pair dpd / dpd/tstat; ops/dpd.py)
    dpd: Optional[object] = None            # ops.dpd.DPDParams
    # DREIDING hydrogen bonds (pair hbond/dreiding/lj + /morse;
    # ops/hbond.py) — a 3-body donor-hydrogen-acceptor term added on top
    # of the pair kernels (usually via pair_style hybrid/overlay)
    hbond: tuple = ()                       # tuple[ops.hbond.HbondParams]
    # CHARMM CMAP crossterms (fix cmap; ops/cmap.py)
    cmap: Optional[object] = None           # ops.cmap.CMAPParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ForceResult:
    f: jax.Array
    evdwl: jax.Array
    ecoul: jax.Array
    elong: jax.Array
    epol: jax.Array
    ebond: jax.Array
    virial: jax.Array       # (6,) xx yy zz xy xz yz
    mu: jax.Array           # induced dipoles after SCF
    scf_iters: jax.Array
    scf_diverged: jax.Array
    eangle: jax.Array = 0.0
    edihed: jax.Array = 0.0
    eimp: jax.Array = 0.0
    # fix cmap crossterm energy (always reported via the f_ID thermo
    # column; folded into efix -> PE only under fix_modify energy yes)
    ecmap: jax.Array = 0.0
    efix: jax.Array = 0.0

    @property
    def epair(self):
        """Thermo E_pair = evdwl + ecoul + elong + epol (pair + kspace)."""
        return self.evdwl + self.ecoul + self.elong + self.epol

    @property
    def emol(self):
        """Thermo E_mol = bond + angle + dihedral + improper."""
        return self.ebond + self.eangle + self.edihed + self.eimp

    @property
    def pe(self):
        """Total potential: E_pair + E_mol + fix energies
        (compute_pe.cpp; fix contributions gated by fix_modify energy)."""
        return self.epair + self.emol + self.efix


def _pallas_ok(ff, sys) -> bool:
    """Route the single-type f32 LJ cell path through the VMEM-tiled
    Pallas kernel on TPU backends (25% faster than the XLA roll kernel:
    one fused pass per candidate block instead of several HBM-bounced
    reductions).  Everything else keeps the XLA kernel."""
    import jax as _jax
    import jax.numpy as _jnp

    p = ff.pair
    if p is None or p.kind != "lj" or p.coul or p.charmm:
        return False
    if p.excl is not None or p.excl_mol or ff.sp_idx is not None:
        return False
    if p.lj1.shape[0] - 1 > 1:
        return False
    if sys.x.dtype != _jnp.float32:
        return False
    if sys.box.triclinic or not all(sys.box.periodic):
        return False
    try:
        return _jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def compute_forces(sys: System, ff: ForceField,
                   nlist: Optional[NeighborList] = None,
                   need_ev: bool = True, terms=None) -> ForceResult:
    """Evaluate every force term. Uses the dense all-pairs path when no
    neighbor list is given (small systems / validation).

    need_ev=False (the LAMMPS eflag/vflag=0 analog, Pair::ev_setup
    pair.cpp:752) skips energy/virial math on the cell-kernel hot path;
    scan-internal steps don't consume them.

    terms: optional static collection restricting which categories are
    evaluated — {'pair','bond','angle','dihedral','improper','kspace',
    'polar'} — the rRESPA level split (Respa::recurse evaluates each
    level's forces separately, respa.cpp)."""
    if terms is not None:
        terms = frozenset(terms)

        def _on(name):
            return name in terms
    else:
        def _on(name):
            return True
    dtype = sys.x.dtype
    zero = jnp.zeros((), dtype)
    f = jnp.zeros_like(sys.x)
    evdwl = ecoul = elong = epol = ebond = zero
    virial = jnp.zeros((6,), dtype)
    mu = sys.mu
    scf_iters = jnp.zeros((), jnp.int32)
    scf_diverged = jnp.zeros((), bool)

    if ff.pair is not None and _on("pair"):
        from lidp_tpu.ops.cells import Cells, cell_pair_forces

        if ff.adapt is not None and ff.adapt_window is not None:
            # fix adapt pair ... a * * v_RAMP: the prefactor table follows
            # the per-run ramp (fix_adapt.cpp + variable.cpp ramp())
            from lidp_tpu.integrate.nvt import ramp_target

            lo, hi = ff.adapt
            v_t = ramp_target(jnp.asarray(lo, dtype),
                              jnp.asarray(hi, dtype),
                              ff.adapt_window[0], ff.adapt_window[1],
                              sys.step)
            t1 = jnp.full_like(ff.pair.lj1, v_t)
            t1 = t1.at[0, :].set(0.0).at[:, 0].set(0.0)
            ff = dataclasses.replace(
                ff, pair=dataclasses.replace(ff.pair, lj1=t1))

        if isinstance(nlist, Cells):
            if (_pallas_ok(ff, sys)
                    and min(nlist.atom_of_slot.shape[:3]) >= 3):
                from lidp_tpu.ops.pallas_pair import cell_pair_forces_pallas

                fp, ev, ec, vir = cell_pair_forces_pallas(
                    sys.x, sys.mask, nlist, sys.box, ff.pair,
                    need_ev=need_ev)
            else:
                fp, ev, ec, vir = cell_pair_forces(
                    sys.x, sys.q, sys.type, sys.mask, nlist, sys.box,
                    ff.pair, need_ev=need_ev, mol=sys.mol)
            if ff.sp_idx is not None and not ff.pair.excl_mol:
                from lidp_tpu.ops.bonded import special_correction_sparse

                fc, dev_, dec_, dvir = special_correction_sparse(
                    sys.x, sys.q, sys.type, ff.sp_idx, ff.sp_lvl, sys.mask,
                    sys.box, ff.pair)
                fp = fp + fc
                ev, ec, vir = ev + dev_, ec + dec_, vir + dvir
        elif nlist is not None:
            fp, ev, ec, vir = neighbor_pair_forces(
                sys.x, sys.q, sys.type, sys.mask, nlist, sys.box, ff.pair,
                sp_code_dense=ff.sp_code, mol=sys.mol)
        else:
            sp = ff.sp_code if ff.sp_code is not None else 0
            fp, ev, ec, vir = pair_ops.dense_pair_forces(
                sys.x, sys.q, sys.type, sp, sys.mask, sys.box, ff.pair,
                mol=sys.mol)
        f = f + fp
        evdwl, ecoul = evdwl + ev, ecoul + ec
        virial = virial + vir
        if ff.pair.coul and ff.pair.coul_kind in ("dsf", "wolf") \
                and need_ev:
            from lidp_tpu.ops.pair import dsf_wolf_self_energy

            ecoul = ecoul + dsf_wolf_self_energy(ff.pair, sys.q, sys.mask)

        # hybrid sub-styles: one masked kernel pass each, statically
        # unrolled (pair_hybrid.cpp compute() sub-style loop analog)
        for pex in ff.extra_pairs:
            if isinstance(nlist, Cells):
                fp, ev, ec, vir = cell_pair_forces(
                    sys.x, sys.q, sys.type, sys.mask, nlist, sys.box,
                    pex, need_ev=need_ev, mol=sys.mol)
                if ff.sp_idx is not None and not pex.excl_mol:
                    from lidp_tpu.ops.bonded import (
                        special_correction_sparse)

                    fc, dev_, dec_, dvir = special_correction_sparse(
                        sys.x, sys.q, sys.type, ff.sp_idx, ff.sp_lvl,
                        sys.mask, sys.box, pex)
                    fp = fp + fc
                    ev, ec, vir = ev + dev_, ec + dec_, vir + dvir
            elif nlist is not None:
                fp, ev, ec, vir = neighbor_pair_forces(
                    sys.x, sys.q, sys.type, sys.mask, nlist, sys.box,
                    pex, sp_code_dense=ff.sp_code, mol=sys.mol)
            else:
                sp = ff.sp_code if ff.sp_code is not None else 0
                fp, ev, ec, vir = pair_ops.dense_pair_forces(
                    sys.x, sys.q, sys.type, sp, sys.mask, sys.box, pex,
                    mol=sys.mol)
            f = f + fp
            evdwl, ecoul = evdwl + ev, ecoul + ec
            virial = virial + vir
            if pex.coul and pex.coul_kind in ("dsf", "wolf") and need_ev:
                from lidp_tpu.ops.pair import dsf_wolf_self_energy

                ecoul = ecoul + dsf_wolf_self_energy(pex, sys.q, sys.mask)

    if ff.hbond and _on("pair"):
        from lidp_tpu.ops.hbond import hbond_forces

        for hbp_ in ff.hbond:
            fh, evh, virh = hbond_forces(sys.x, sys.mask, sys.box, hbp_,
                                         need_ev=need_ev)
            f = f + fh
            evdwl = evdwl + evh
            virial = virial + virh

    if ff.dpd is not None and _on("pair"):
        from lidp_tpu.ops.dpd import dpd_forces

        fd, evd, vird = dpd_forces(sys.x, sys.v, sys.type, sys.mask,
                                   sys.box, ff.dpd, sys.step,
                                   sp_code=ff.sp_code, need_ev=need_ev)
        f = f + fd
        evdwl = evdwl + evd
        virial = virial + vird

    if ff.tip4p is not None and _on("pair"):
        from lidp_tpu.ops.tip4p import redistribute, tip4p_coul_dense

        sp = ff.sp_code if ff.sp_code is not None else 0
        fcs, ec4, vc4 = tip4p_coul_dense(
            sys.x, sys.q, sp, sys.mask, sys.box, ff.pair.cut_coulsq,
            ff.pair.g_ewald, ff.qqrd2e, ff.pair.special_coul, ff.tip4p,
            mode="cut" if ff.tip4p_cut else "long")
        f = f + redistribute(fcs, ff.tip4p)
        ecoul = ecoul + ec4
        virial = virial + vc4

    if ff.eam is not None and _on("pair"):
        from lidp_tpu.ops.cells import Cells
        from lidp_tpu.ops.eam import (EAMAlloyParams, eam_alloy_cell_forces,
                                      eam_cell_forces)

        if not isinstance(nlist, Cells):
            raise NotImplementedError("pair_style eam requires the cell path")
        if isinstance(ff.eam, EAMAlloyParams):
            fe_, ev, vir_ = eam_alloy_cell_forces(
                sys.x, sys.type, sys.mask, nlist, sys.box, ff.eam,
                need_ev=need_ev)
        else:
            fe_, ev, vir_ = eam_cell_forces(
                sys.x, sys.mask, nlist, sys.box, ff.eam, need_ev=need_ev)
        f = f + fe_
        evdwl = evdwl + ev
        virial = virial + vir_

    if ff.bond is not None and _on("bond"):
        from lidp_tpu.ops.bonded import bond_forces, bond_quartic_full

        for bp in (ff.bond if isinstance(ff.bond, tuple) else (ff.bond,)):
            if bp.style == "quartic":
                # quartic's pair subtraction tallies into the PAIR
                # accumulators (bond_quartic.cpp pair->ev_tally block)
                fb, eb, vb, dev, dvp = bond_quartic_full(sys.x, sys.box, bp)
                evdwl = evdwl + dev
                virial = virial + dvp
            else:
                fb, eb, vb = bond_forces(sys.x, sys.box, bp)
            f = f + fb
            ebond = ebond + eb
            virial = virial + vb

    eangle = edihed = eimp = jnp.zeros((), sys.x.dtype)
    if ff.angle is not None and _on("angle"):
        from lidp_tpu.ops.bonded import angle_forces

        for ap in (ff.angle if isinstance(ff.angle, tuple)
                   else (ff.angle,)):
            fa, ea, va = angle_forces(sys.x, sys.box, ap)
            f = f + fa
            eangle = eangle + ea
            virial = virial + va

    if ff.dihedral is not None and _on("dihedral"):
        from lidp_tpu.ops.bonded import charmm_14_forces, dihedral_forces

        for dp in (ff.dihedral if isinstance(ff.dihedral, tuple)
                   else (ff.dihedral,)):
            fd, ed, vd = dihedral_forces(sys.x, sys.box, dp)
            f = f + fd
            edihed = edihed + ed
            virial = virial + vd
            if (dp.style in ("charmm", "charmmfsw")
                    and dp.q is not None):
                # weighted 1-4 pair term tallies into the PAIR accumulators
                # (dihedral_charmm.cpp ev_tally evdwl/ecoul)
                f14, ev14, ec14, v14 = charmm_14_forces(sys.x, sys.box, dp)
                f = f + f14
                evdwl = evdwl + ev14
                ecoul = ecoul + ec14
                virial = virial + v14

    if ff.improper is not None and _on("improper"):
        from lidp_tpu.ops.bonded import improper_forces

        for ip in (ff.improper if isinstance(ff.improper, tuple)
                   else (ff.improper,)):
            fi_, ei_, vi_ = improper_forces(sys.x, sys.box, ip)
            f = f + fi_
            eimp = eimp + ei_
            virial = virial + vi_

    if (ff.ewald is not None or ff.pppm is not None) and _on("kspace"):
        # TIP4P: the reciprocal sum sees the charge-site positions and its
        # forces redistribute onto O/H (pppm_tip4p.cpp particle_map +
        # fieldforce M-site splitting)
        xk = sys.x
        if ff.tip4p is not None:
            from lidp_tpu.ops.tip4p import charge_sites

            xk = charge_sites(sys.x, sys.box, ff.tip4p)
        if ff.ewald is not None:
            ewp = ff.ewald
            if ff.kspace_dynamic:
                ewp = ewald_ops.rescale_coeffs(ewp, sys.box.lengths)
            fk, el, vk = ewald_ops.ewald_forces(xk, sys.q, sys.box.volume,
                                                ewp)
        else:
            from lidp_tpu.ops.pppm import pppm_forces_params

            fk, el, vk = pppm_forces_params(xk - sys.box.lo, sys.q,
                                            sys.box.lengths, ff.pppm)
        if ff.tip4p is not None:
            from lidp_tpu.ops.tip4p import redistribute

            fk = redistribute(fk, ff.tip4p)
        f = f + fk
        elong = elong + el
        virial = virial + vk

    if ff.msm is not None and _on("kspace"):
        from lidp_tpu.ops.msm import msm_forces

        fm, em, vm = msm_forces(sys.x - sys.box.lo, sys.q,
                                sys.box.lengths, ff.msm)
        f = f + fm
        elong = elong + em
        virial = virial + vm

    if ff.pppm_disp is not None and _on("kspace"):
        from lidp_tpu.ops.pppm import pppm_disp_forces

        f6, e6, v6 = pppm_disp_forces(sys.x - sys.box.lo, ff.b_atom,
                                      sys.box.lengths, ff.pppm_disp)
        f = f + f6
        elong = elong + e6
        virial = virial + v6

    if ff.ewald6 is not None and _on("kspace"):
        # reciprocal geometric dispersion (EwaldDisp func[1]); tallies into
        # elong like every k-space energy (ewald_disp.cpp compute())
        f6, e6, v6 = ewald_ops.ewald6_forces(sys.x, ff.b_atom,
                                             sys.box.volume, ff.ewald6)
        f = f + f6
        elong = elong + e6
        virial = virial + v6

    if ff.polar is not None and _on("polar"):
        s = ff.polar
        e0 = pol_ops.static_field_wolf(
            sys.x, sys.q, sys.mol, sys.mask, sys.box,
            ff.pair.cut_coulsq, ff.qqrd2e)
        tensor = pol_ops.dipole_field_tensor(sys.x, sys.alpha, sys.mask, sys.box, s)
        mu_init = sys.mu if s.use_previous else None
        if ff.reference_gs and (s.polar_gs or s.polar_gs_ranked):
            rank = pol_ops.rank_metric_compute(
                sys.x, sys.alpha, sys.mol, sys.mask, sys.box)
            mu, scf_iters, scf_diverged = pol_ops.scf_solve_gauss_seidel(
                e0, sys.alpha, tensor, s, rank_metric=rank, mu_init=mu_init)
        else:
            mu, scf_iters, scf_diverged = pol_ops.scf_solve(
                e0, sys.alpha, tensor, s, mu_init=mu_init)
        fpol, upol, vpol = pol_ops.dipole_forces_energy(
            sys.x, sys.q, sys.mol, sys.alpha, mu, sys.mask, sys.box,
            ff.pair.cut_coulsq, ff.qqrd2e, s, xshift=ff.polar_xshift)
        f = f + fpol
        epol = epol + upol
        virial = virial + vpol

    ecmap = jnp.zeros((), sys.x.dtype)
    efix = jnp.zeros((), sys.x.dtype)
    if ff.cmap is not None and _on("bond"):
        from lidp_tpu.ops.cmap import cmap_forces

        fcm, ecmap, vircm = cmap_forces(sys.x, ff.cmap, need_ev=need_ev)
        f = f + fcm
        virial = virial + vircm
        if ff.cmap.energy:
            efix = efix + ecmap

    return ForceResult(
        f=f, evdwl=evdwl, ecoul=ecoul, elong=elong, epol=epol, ebond=ebond,
        virial=virial, mu=mu, scf_iters=scf_iters, scf_diverged=scf_diverged,
        eangle=eangle, edihed=edihed, eimp=eimp, ecmap=ecmap, efix=efix,
    )
