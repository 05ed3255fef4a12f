"""Weighted load balance — the balance.cpp / rcb.cpp / imbalance_*.cpp
analog for a GSPMD atom-axis engine.

The reference migrates atoms between MPI ranks so each rank's *weighted*
particle cost is equal: `balance` / `fix balance` compose per-atom weights
(imbalance_group.cpp, imbalance_var.cpp, imbalance_neigh.cpp,
imbalance_store.cpp) and repartition either by shifting brick cut planes
(balance.cpp Balance::shift) or by recursive coordinate bisection
(rcb.cpp).

On TPU the decomposition is an index-blocked GSPMD shard of the atom axis:
shard k owns rows [k*m, (k+1)*m).  Equal-shaped blocks are a hard
requirement of the compiled SPMD program, so the balance degree of freedom
is not *where the cuts are* but *which atom sits in which row*: a weighted
balance is a PERMUTATION of the atom order such that every equal-sized row
block carries (near-)equal total weight.  This module provides

  * composed per-atom weights with the reference's semantics
    (`compose_weights` — group / var / neigh / store multiply into 1.0),
  * `balanced_permutation` — the capacity-constrained LPT assignment that
    realizes the weighted partition as a row permutation,
  * `rcb_assign` — a faithful recursive-coordinate-bisection assignment
    (weighted-median cuts, proc split proportional to the subtree sizes,
    rcb.cpp:156-253) used by `balance ... rcb` for reporting and for
    spatially-coherent shard layouts,
  * `imbalance_factor` — max shard cost / mean shard cost
    (balance.cpp:577-596 imbalance_factor).

Caveat measured in scripts/shard_load_probe.py: the engine's O(N^2) polar
panels and the padded slot kernel do the SAME arithmetic for every row
(masked dense math), so on those paths the wall clock is permutation
-invariant by construction and balance only equalizes *useful* (unmasked)
work.  The machinery still matters for reporting parity and for any
future masked-sparse path.
"""

from __future__ import annotations

import numpy as np


def imbalance_factor(weights: np.ndarray, shard_of_atom: np.ndarray,
                     nshards: int) -> float:
    """max shard cost / mean shard cost (balance.cpp imbalance_factor)."""
    w = np.asarray(weights, float)
    cost = np.bincount(np.asarray(shard_of_atom), weights=w,
                       minlength=nshards)
    mean = w.sum() / nshards
    return float(cost.max() / mean) if mean > 0 else 1.0


def block_assignment(n: int, nshards: int,
                     perm: np.ndarray | None = None) -> np.ndarray:
    """shard id of each atom under the index-blocked GSPMD layout,
    optionally after reordering rows by `perm` (perm[r] = atom in row r)."""
    m = -(-n // nshards)
    shard_of_row = np.minimum(np.arange(n) // m, nshards - 1)
    if perm is None:
        return shard_of_row
    out = np.empty(n, np.int64)
    out[np.asarray(perm)] = shard_of_row
    return out


def balanced_permutation(weights: np.ndarray, nshards: int) -> np.ndarray:
    """Row permutation equalizing per-block weight under equal block sizes.

    Capacity-constrained LPT (longest processing time first): visit atoms
    in descending weight, place each in the lightest not-yet-full shard.
    Returns perm with perm[r] = original atom index occupying row r, so
    `x[perm]` lays rows out in balanced block order.  O(N log N + N*P) —
    the per-atom argmin over P shards is a vector op.
    """
    w = np.asarray(weights, float)
    n = w.shape[0]
    m = -(-n // nshards)             # rows per shard (last may be short)
    capacity = np.full(nshards, m, np.int64)
    capacity[-1] = n - m * (nshards - 1)
    order = np.argsort(-w, kind="stable")
    load = np.zeros(nshards)
    fill = np.zeros(nshards, np.int64)
    shard_of_atom = np.empty(n, np.int64)
    for i in order:
        masked = np.where(fill < capacity, load, np.inf)
        k = int(np.argmin(masked))
        shard_of_atom[i] = k
        load[k] += w[i]
        fill[k] += 1
    # rows: shard-major, original index order within a shard (stable)
    perm = np.argsort(shard_of_atom, kind="stable")
    return perm


def rcb_assign(x: np.ndarray, weights: np.ndarray, nshards: int,
               box_lo, box_hi, dims: str = "xyz") -> np.ndarray:
    """Recursive coordinate bisection (rcb.cpp): returns shard id per atom.

    Each recursion splits the shard set into nlo = ceil(p/2), nhi = p-nlo
    and cuts the longest allowed dimension at the weighted quantile
    nlo/p (rcb.cpp proportional split), recursing on each side.
    """
    x = np.asarray(x, float)
    w = np.asarray(weights, float)
    lo = np.asarray(box_lo, float).copy()
    hi = np.asarray(box_hi, float).copy()
    allowed = [("xyz".index(c)) for c in dims if c in "xyz"] or [0, 1, 2]
    out = np.zeros(x.shape[0], np.int64)

    def rec(idx, lo, hi, base, p):
        if p <= 1 or idx.size == 0:
            out[idx] = base
            return
        nlo = (p + 1) // 2
        ext = hi - lo
        d = max(allowed, key=lambda k: ext[k])
        frac = nlo / p
        xs = x[idx, d]
        order = np.argsort(xs, kind="stable")
        cw = np.cumsum(w[idx][order])
        total = cw[-1] if cw.size else 0.0
        if total <= 0:
            k = int(round(frac * idx.size))
        else:
            k = int(np.searchsorted(cw, frac * total, side="left")) + 1
            k = min(max(k, 1), idx.size - 1) if idx.size > 1 else 0
        cut = xs[order[k - 1]] if k > 0 else lo[d]
        lo_idx, hi_idx = idx[order[:k]], idx[order[k:]]
        lo2, hi2 = hi.copy(), lo.copy()
        lo2[d] = cut
        hi2[d] = cut
        rec(lo_idx, lo, lo2, base, nlo)
        rec(hi_idx, hi2, hi, base + nlo, p - nlo)

    rec(np.arange(x.shape[0]), lo, hi, 0, nshards)
    return out


def neigh_counts(x: np.ndarray, box_lo, box_hi, cutoff: float,
                 chunk: int | None = None, tilt=None,
                 budget_bytes: int = 1 << 30) -> np.ndarray:
    """Half-neighbor counts within `cutoff` under periodic minimum image —
    the per-atom analog of imbalance_neigh.cpp's numneigh sum (the
    reference only has per-RANK granularity, weight = neighsum/nlocal;
    per-atom counts are strictly finer and reduce to the same rank totals).
    Chunked O(N^2) on host: fine for balance-time use.

    chunk defaults to budget_bytes of (chunk, N, 3) f64 intermediates so
    large N (256k-1M, where `balance weight neigh` matters most) stays
    within host RAM instead of OOMing.  tilt = (xy, xz, yz) routes
    triclinic boxes through the lamda-space fold (domain.cpp x2lamda)."""
    x = np.asarray(x, float)
    L = np.asarray(box_hi, float) - np.asarray(box_lo, float)
    n = x.shape[0]
    if chunk is None:
        # ~8 arrays of (chunk, n) f64 live at once in the hot expression
        chunk = int(max(64, budget_bytes // (64 * max(n, 1))))
    tri = tilt is not None and np.any(np.asarray(tilt) != 0.0)
    if tri:
        xy, xz, yz = (float(t) for t in tilt)
        h = np.array([[L[0], xy, xz], [0.0, L[1], yz], [0.0, 0.0, L[2]]])
        hinv = np.linalg.inv(h)
        lam = (x - np.asarray(box_lo, float)) @ hinv.T
    counts = np.zeros(n, np.int64)
    for s in range(0, n, chunk):
        if tri:
            dl = lam[s:s + chunk, None, :] - lam[None, :, :]
            dl -= np.round(dl)
            d = dl @ h.T
        else:
            d = x[s:s + chunk, None, :] - x[None, :, :]
            d -= np.round(d / L) * L
        within = (d ** 2).sum(-1) <= cutoff * cutoff
        ii = np.arange(s, min(s + chunk, n))
        within[np.arange(ii.size), ii] = False
        # half counts: j > i only (numneigh of a half list)
        within &= np.arange(n)[None, :] > ii[:, None]
        counts[s:s + chunk] = within.sum(-1)
    return counts


def apply_factor(localwt: np.ndarray, factor: float) -> np.ndarray:
    """imbalance_neigh.cpp:92-103 — rescale the weight spread so
    hi/lo becomes `factor` times larger, keeping lo fixed."""
    if factor == 1.0:
        return localwt
    wtlo, wthi = float(localwt.min()), float(localwt.max())
    if wtlo == wthi:
        return localwt
    newhi = wthi * factor
    return wtlo + (localwt - wtlo) / (wthi - wtlo) * (newhi - wtlo)
