"""Bond topology -> special 1-2/1-3/1-4 exclusion lists.

Host-side equivalent of Special::build (reference special.cpp:55): BFS over
the bond graph gives each atom its 1-2 (bonded), 1-3 (two hops), 1-4 (three
hops) neighbor sets, deduplicated with closer relations winning
(special.cpp combine/dedup semantics).

The result is exported as a dense (N,N) int8 matrix of special codes
(0 = none, 1/2/3 = 1-2/1-3/1-4) for the all-pairs kernels — fine for the
example-scale systems; large molecular systems get a compressed encoding
later.
"""

from __future__ import annotations

import numpy as np


def special_codes_dense(natoms: int, bonds: np.ndarray) -> np.ndarray:
    """bonds: (NB,2) 1-based atom ids. Returns (N,N) int8 code matrix."""
    code = np.zeros((natoms, natoms), np.int8)
    if bonds.size == 0:
        return code
    adj = [[] for _ in range(natoms)]
    for a, b in bonds:
        a, b = int(a) - 1, int(b) - 1
        adj[a].append(b)
        adj[b].append(a)

    for i in range(natoms):
        onetwo = set(adj[i])
        onethree = set()
        for j in onetwo:
            onethree.update(adj[j])
        onethree -= onetwo | {i}
        onefour = set()
        for j in onethree:
            onefour.update(adj[j])
        onefour -= onetwo | onethree | {i}
        for j in onetwo:
            code[i, j] = 1
        for j in onethree:
            code[i, j] = 2
        for j in onefour:
            code[i, j] = 3
    return code
