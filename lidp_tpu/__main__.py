"""CLI entry point: ``python -m lidp_tpu -in script.input [-log file] [-var k v]``.

The analog of the reference's lmp binary (main.cpp:53, CLI flags
lammps.cpp:109-221 subset: -in, -log, -var, -echo).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lidp_tpu")
    ap.add_argument("-in", dest="infile", required=True)
    ap.add_argument("-log", dest="logfile", default="log.lidp")
    ap.add_argument("-var", dest="vars", nargs=2, action="append", default=[])
    ap.add_argument("-echo", dest="echo", default="none")
    ap.add_argument("--x64", action="store_true", default=True)
    ap.add_argument("--f32", dest="x64", action="store_false")
    ap.add_argument("-sharding", dest="sharding", type=int, default=0,
                    help="shard the engine over N devices (mpirun -np analog)")
    args = ap.parse_args(argv)

    import os

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    # honor JAX_PLATFORMS even when a platform plugin ignores the env var
    # (f64 parity runs belong on the CPU backend)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from lidp_tpu.io.script import LammpsScript

    logf = open(args.logfile, "w") if args.logfile != "none" else None

    def log(line):
        print(line)
        if logf:
            logf.write(line + "\n")
            logf.flush()

    import jax.numpy as jnp

    script = LammpsScript(dtype=jnp.float64 if args.x64 else jnp.float32,
                          log=log)
    if args.sharding:
        script.n_shard_devices = args.sharding
    for k, v in args.vars:
        script.variables[k] = v

    def thermo_cb(row):
        pass

    try:
        script.file(args.infile)
    finally:
        if logf:
            logf.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
