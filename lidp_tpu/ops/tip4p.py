"""TIP4P off-site charge Coulomb — `pair_style lj/cut/tip4p/long`.

TPU-native equivalent of the reference's TIP4P machinery
(/root/reference/src/KSPACE/pair_lj_cut_tip4p_long.cpp):

  * the water oxygen's charge acts at the massless M site
    xM = xO + alpha/2 * ((xH1-xO) + (xH2-xO))   (compute_newsite, :478-494)
    with alpha = qdist / (cos(theta0/2) * r0)   (init_style, :471-474);
  * LJ acts between the real atom positions, Coulomb between charge sites
    (compute, :190-240: "LJ interaction based on true rsq" then "adjust rsq
    and delxyz for off-site O charge");
  * forces on an M site redistribute affinely onto O/H1/H2:
    fO = (1-alpha) fM, fH = alpha/2 fM (:321-327);
  * the reciprocal-space (pppm/tip4p) part evaluates at M sites and
    redistributes identically (pppm_tip4p.cpp particle_map/fieldforce).

Because the redistribution weights sum to 1, the *global* virial of a
charge-site pair equals r_MM' (x) f_pair — exactly what ev_tally_tip4p
distributes among the real atoms (pair.cpp ev_tally_tip4p) — so the pair
virial here is tallied on charge-site separations with no correction term.

The whole per-atom mapping is two O(N) gathers + two scatter-adds; the
reference's hneigh caching/atom->map lookups (:146-170) are replaced by
static h1/h2 index arrays built once from the topology (tags O+1, O+2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidp_tpu.box import Box, min_image_box
from lidp_tpu.ops.pair import A1, A2, A3, A4, A5, EWALD_F, EWALD_P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TIP4PParams:
    h1: jax.Array        # (N,) int32 first-H index (self for non-O atoms)
    h2: jax.Array        # (N,) int32 second-H index
    is_o: jax.Array      # (N,) bool
    alpha: jax.Array     # () qdist / (cos(theta0/2) * r0)


def make_tip4p_params(type_, tags, type_o: int, type_h: int,
                      alpha: float, dtype=jnp.float64) -> TIP4PParams:
    """Host-side construction: H1/H2 are the atoms with tag O+1 / O+2
    (pair_lj_cut_tip4p_long.cpp:146-152 atom->map(tag[i]+1))."""
    import numpy as np

    type_ = np.asarray(type_)
    tags = np.asarray(tags)
    n = type_.shape[0]
    tag_to_idx = {int(t): i for i, t in enumerate(tags)}
    h1 = np.arange(n, dtype=np.int32)
    h2 = np.arange(n, dtype=np.int32)
    is_o = type_ == type_o
    for i in np.nonzero(is_o)[0]:
        j1 = tag_to_idx.get(int(tags[i]) + 1)
        j2 = tag_to_idx.get(int(tags[i]) + 2)
        if j1 is None or j2 is None:
            raise ValueError("TIP4P hydrogen is missing")
        if type_[j1] != type_h or type_[j2] != type_h:
            raise ValueError("TIP4P hydrogen has incorrect atom type")
        h1[i], h2[i] = j1, j2
    return TIP4PParams(h1=jnp.asarray(h1), h2=jnp.asarray(h2),
                       is_o=jnp.asarray(is_o),
                       alpha=jnp.asarray(alpha, dtype))


def charge_sites(x, box: Box, tp: TIP4PParams):
    """Per-atom charge-site positions: M for O atoms, x elsewhere
    (compute_newsite with closest-image H displacements, :156-158)."""
    d1 = min_image_box(x[tp.h1] - x, box)
    d2 = min_image_box(x[tp.h2] - x, box)
    shift = tp.alpha * 0.5 * (d1 + d2)
    return x + jnp.where(tp.is_o[:, None], shift, 0.0)


def redistribute(f_cs, tp: TIP4PParams):
    """Affine force map from charge sites onto real atoms
    (fO = (1-alpha) fM, fH += alpha/2 fM, :321-327).  Non-O rows pass
    through; their h1 == h2 == self and fm == 0 make the adds no-ops."""
    fm = jnp.where(tp.is_o[:, None], f_cs, 0.0)
    f = f_cs - tp.alpha * fm
    f = f.at[tp.h1].add(0.5 * tp.alpha * fm)
    f = f.at[tp.h2].add(0.5 * tp.alpha * fm)
    return f


def tip4p_coul_dense(x, q, sp_code, mask, box: Box, cut_coulsq, g_ewald,
                     qqrd2e, special_coul, tp: TIP4PParams, mode="long"):
    """Dense (N,N) real-space Coulomb between charge sites.

    mode="long": erfc-damped Ewald real space
    (pair_lj_cut_tip4p_long.cpp / pair_tip4p_long.cpp); special-bond
    handling follows the kspace-present convention
    forcecoul -= (1-factor)*prefactor on the M-site separation
    (compute, :263-268).

    mode="cut": bare cutoff Coulomb with the multiplicative special factor
    (pair_tip4p_cut.cpp:211-214 cforce = factor_coul*qqrd2e*qi*qj/r*r2inv,
    ecoul *= factor_coul at :343; pair_lj_cut_tip4p_cut.cpp identical).

    Returns (f_chargesite (N,3), ecoul, virial6); the caller redistributes
    forces with `redistribute`."""
    xs = charge_sites(x, box, tp)
    n = x.shape[0]
    delta = min_image_box(xs[:, None, :] - xs[None, :, :], box)
    rsq = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    pair_mask = (~eye) & mask[:, None] & mask[None, :]
    rsq = jnp.where(pair_mask, rsq, 1.0)

    factor_coul = special_coul[sp_code]
    cm = pair_mask & (rsq < cut_coulsq)
    r = jnp.sqrt(rsq)
    prefactor = qqrd2e * q[:, None] * q[None, :] / r
    if mode == "cut":
        forcecoul = factor_coul * prefactor
        ecoul = factor_coul * prefactor
    else:
        grij = g_ewald * r
        expm2 = jnp.exp(-grij * grij)
        t = 1.0 / (1.0 + EWALD_P * grij)
        erfc = t * (A1 + t * (A2 + t * (A3 + t * (A4 + t * A5)))) * expm2
        forcecoul = prefactor * (erfc + EWALD_F * grij * expm2) \
            - (1.0 - factor_coul) * prefactor
        ecoul = prefactor * erfc - (1.0 - factor_coul) * prefactor
    forcecoul = jnp.where(cm, forcecoul, 0.0)
    ecoul = jnp.where(cm, ecoul, 0.0)

    fpair = forcecoul / rsq
    f_cs = jnp.sum(fpair[:, :, None] * delta, axis=1)
    w = 0.5 * fpair
    virial = jnp.stack([
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 0]),
        jnp.sum(w * delta[:, :, 1] * delta[:, :, 1]),
        jnp.sum(w * delta[:, :, 2] * delta[:, :, 2]),
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 1]),
        jnp.sum(w * delta[:, :, 0] * delta[:, :, 2]),
        jnp.sum(w * delta[:, :, 1] * delta[:, :, 2]),
    ])
    return f_cs, 0.5 * jnp.sum(ecoul), virial
