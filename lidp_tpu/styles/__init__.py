"""Style registry — the TPU analog of the reference's macro-expanded style
maps (Force::create_pair / Modify::add_fix dispatch built from style_*.h,
force.cpp:83-88, modify.cpp:778).

Each fix style registers a builder with @fix_style(name); builders receive
the shared FixBuildCtx and either install hooks (post_force /
post_integrate / end_of_step) or set ctx.integ.  Simulation.from_script
just loops the registry — adding a fix style touches one styles/ module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

FIX_BUILDERS: Dict[str, Callable] = {}


def fix_style(*names, integrator: bool = False):
    """Register a fix builder. integrator=True marks time-integration
    styles (at most one per run, like the reference's single Verlet
    update loop over integrate fixes)."""
    def deco(fn):
        fn._integrator = integrator
        for nm in names:
            FIX_BUILDERS[nm] = fn
        return fn
    return deco


def is_integrator(style: str) -> bool:
    b = FIX_BUILDERS.get(style)
    return bool(b is not None and getattr(b, "_integrator", False))


@dataclasses.dataclass
class FixBuildCtx:
    """Mutable build context threaded through fix builders.

    Inputs are set by Simulation.from_script; builders append to the hook
    sinks, adjust dof bookkeeping, or set `integ`/recorded specs.
    """

    script: Any
    groups: Any            # {name: (npad,) jnp bool}
    u: Any                 # units table
    dtype: Any
    npad: int
    n: int
    mass_atom: Any         # (npad,) np
    dim: int
    padA: Callable         # _padA(a, fill=0.0)
    sys: Any               # System under construction (shake shifts x)
    shake_found: Any = None
    shake_cfg: Any = (1e-4, 25)

    # ---- sinks ----
    pf_hooks: list = dataclasses.field(default_factory=list)
    pf_hooks_setup: list = dataclasses.field(default_factory=list)
    pi_hooks: list = dataclasses.field(default_factory=list)
    eos_hooks: list = dataclasses.field(default_factory=list)
    dof_removals: list = dataclasses.field(default_factory=list)
    rigid_groups: list = dataclasses.field(default_factory=list)
    dof_removed: float = 0.0
    shake_dof_removed: int = 0
    rattle_params: Any = None
    halt_spec: Any = None
    pending_temp_fix: Any = None
    deform_fix: Any = None
    integ: Any = None


def build_fixes(ctx: FixBuildCtx):
    """Run every fix spec through the registry (declaration order, like
    Modify's per-hook fan-out lists)."""
    # import for registration side effects
    from lidp_tpu.styles import fix_integrators  # noqa: F401
    from lidp_tpu.styles import fix_modifiers    # noqa: F401

    n_integrators = sum(1 for f in ctx.script.fixes.values()
                        if is_integrator(f.style))
    if n_integrators > 1:
        raise NotImplementedError("multiple simultaneous integrator fixes")
    for spec in ctx.script.fixes.values():
        builder = FIX_BUILDERS.get(spec.style)
        if builder is None:
            raise NotImplementedError(f"fix style {spec.style}")
        builder(ctx, spec)
    return ctx
