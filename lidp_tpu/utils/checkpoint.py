"""Checkpoint / resume of the full simulation state pytree.

The analog of the reference's binary restart files (write_restart.cpp:239 —
per-atom payload + fix state blobs; read_restart.cpp:75).  The entire dynamic
state (positions, velocities, charges/ids, induced dipoles, rigid body state,
thermostat chains, step counter) is flattened to named arrays in one
compressed .npz.

Parity note: the reference does NOT persist induced dipoles across restart
(mu_induced missing from the atom-vec restart pack), so `use_previous` warm
starts are lost there; we persist mu and thus resume exactly.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _flatten(prefix: str, obj, out: dict):
    if obj is None or (isinstance(obj, tuple) and not obj):
        return
    if dataclasses.is_dataclass(obj):
        for f in dataclasses.fields(obj):
            if f.metadata.get("static"):
                continue   # static structure lives in code, not checkpoints
            _flatten(f"{prefix}{f.name}.", getattr(obj, f.name), out)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}{k}.", v, out)
    else:
        try:
            out[prefix.rstrip(".")] = np.asarray(obj)
        except TypeError:
            pass  # static metadata lives in code, not in checkpoints


def save_checkpoint(path: str, sys, istate=None, extra: dict | None = None):
    out: dict = {}
    _flatten("sys.", sys, out)
    if istate is not None:
        _flatten("istate.", istate, out)
    if extra:
        for k, v in extra.items():
            out[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **out)
    if not str(path).endswith(".npz"):
        # np.savez appends .npz; restore the user's exact filename
        # (write_restart.cpp writes the literal name; np.load sniffs the
        # zip magic, not the extension)
        import os as _os
        _os.replace(f"{path}.npz", path)


def load_checkpoint(path: str, sys_template, istate_template=None):
    """Restore into templates (same static structure). Returns (sys, istate, extra)."""
    data = np.load(path)

    def rebuild(prefix, template):
        if template is None or (isinstance(template, tuple) and not template):
            return template
        if dataclasses.is_dataclass(template):
            kw = {}
            for f in dataclasses.fields(template):
                cur = getattr(template, f.name)
                key = f"{prefix}{f.name}"
                if f.metadata.get("static"):
                    kw[f.name] = cur   # keep the template's static metadata
                elif dataclasses.is_dataclass(cur):
                    kw[f.name] = rebuild(key + ".", cur)
                elif key in data.files:
                    import jax.numpy as jnp
                    kw[f.name] = jnp.asarray(data[key])
                else:
                    kw[f.name] = cur
            return dataclasses.replace(template, **kw)
        return template

    sys = rebuild("sys.", sys_template)
    istate = rebuild("istate.", istate_template) if istate_template is not None else None
    extra = {k[len("extra."):]: data[k] for k in data.files if k.startswith("extra.")}
    return sys, istate, extra
