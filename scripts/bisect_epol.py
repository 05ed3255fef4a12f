"""Bisect the MOF5+Methane epol gap against the instrumented reference dump.

Reference side: /tmp/lmpbuild (2018 source + allocation fix) run with
LMP_POLDUMP writes per-atom ef_static (unit-folded), mu_induced, alpha and
the u_self/u_ef/u_dd decomposition at step 0.
"""
import os
import shutil
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from lidp_tpu.io.script import LammpsScript
from lidp_tpu.ops import polarization as pol

SRC = "/root/reference/polarization/examples/MOF5+Methane"
DUMP = "/tmp/lmpruns/mof5me/poldump.txt"


def main():
    tmp = "/tmp/bisect_epol"
    os.makedirs(tmp, exist_ok=True)
    shutil.copy(os.path.join(SRC, "MOF5+PCRC.restart.pdb.data"), tmp)
    with open(os.path.join(SRC, "MOF5+PCRC.restart.pdb.input")) as fh:
        text = fh.read()
    import re
    text = re.sub(r"variable  nstep      equal  \d+",
                  "variable  nstep      equal  0", text)
    path = os.path.join(tmp, "in.mof5")
    with open(path, "w") as fh:
        fh.write(text)

    script = LammpsScript(dtype=jnp.float64)
    script.file(path)
    sim = script._sim
    sys_ = sim.sys
    ff = sim.runner.ff

    # reference dump
    ref = np.loadtxt(DUMP)
    with open(DUMP) as fh:
        hdr = fh.readline().split()
    u_self_ref, u_ef_ref, u_dd_ref = (float(hdr[2]), float(hdr[4]),
                                      float(hdr[6]))
    tags = ref[:, 0].astype(int) - 1    # our storage is id order
    e0_ref = np.zeros((len(tags), 3))
    mu_ref = np.zeros((len(tags), 3))
    al_ref = np.zeros(len(tags))
    e0_ref[tags] = ref[:, 1:4]
    mu_ref[tags] = ref[:, 4:7]
    al_ref[tags] = ref[:, 7]

    n = len(tags)
    alpha = np.asarray(sys_.alpha)[:n]
    print("alpha maxdiff:", np.abs(alpha - al_ref).max())

    e0 = pol.static_field_wolf(sys_.x, sys_.q, sys_.mol, sys_.mask, sys_.box,
                               ff.pair.cut_coulsq, ff.qqrd2e)
    e0 = np.asarray(e0)[:n]
    scale = np.abs(e0_ref).max()
    print("E0 maxdiff:", np.abs(e0 - e0_ref).max(), "scale:", scale)

    s = ff.polar
    tensor = pol.dipole_field_tensor(sys_.x, sys_.alpha, sys_.mask, sys_.box, s)
    mu, iters, div = pol.scf_solve(jnp.asarray(e0_ref), sys_.alpha, tensor, s)
    mu = np.asarray(mu)[:n]
    print("SCF iters:", int(iters), "diverged:", bool(div))
    print("mu maxdiff (from ref E0):", np.abs(mu - mu_ref).max(),
          "scale:", np.abs(mu_ref).max())

    # energy decomposition with the reference's own mu
    f, upol, vir = pol.dipole_forces_energy(
        sys_.x, sys_.q, sys_.mol, sys_.alpha, jnp.asarray(mu_ref),
        sys_.mask, sys_.box, ff.pair.cut_coulsq, ff.qqrd2e, s)
    u_self = 0.5 * np.sum(
        np.where(al_ref > 0, (mu_ref ** 2).sum(1) / np.where(al_ref > 0,
                                                             al_ref, 1.0), 0))
    print("u_self ours:", u_self, "ref:", u_self_ref,
          "diff:", u_self - u_self_ref)
    print("u_polar ours (ref mu):", float(upol), "ref:",
          u_self_ref + u_ef_ref + u_dd_ref)


if __name__ == "__main__":
    main()
