"""lidp_tpu — a TPU-native polarizable molecular-dynamics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the LAMMPS fork
``aehogan/lammps-induced-dipole-polarization-pair-style`` (reference mounted at
/root/reference): LJ + real-space Ewald pair forces, reciprocal-space Ewald,
shifted-force (Wolf) static fields, self-consistent induced-dipole polarization
(pair style ``lj/cut/coul/long/polarization``), velocity-Verlet / rigid-body /
Nose-Hoover integration, LAMMPS data-file + input-script compatibility.

Design stance (TPU-first, not a port):
  * state is a fixed-capacity structure-of-arrays pytree; the timestep is a pure
    jitted function advanced with ``lax.scan``;
  * the O(N^2) polarization work (static field, dipole field tensor, dipole
    forces) runs as blocked batched tensor contractions on the MXU, matrix-free
    above a size threshold, sharded over an atom-block mesh axis with
    ``shard_map`` + ``psum``/``ppermute`` (the reference runs these serially on
    one rank: pair_lj_cut_coul_long_polarization.cpp:329-361, :1113-1316);
  * Ewald structure factors are dense [N,K] matmuls + ``psum`` instead of the
    reference's per-atom recursion + MPI_Allreduce (KSPACE/ewald_disp.cpp:721).
"""

__version__ = "0.1.0"

from lidp_tpu import units  # noqa: F401
