"""Dinucleotide-preserving sequence shuffles (negative-set generation).

Altschul-Erickson Eulerian-path shuffle, the algorithm of
/root/reference/utils/dishuffle.rb:36-82: build the dinucleotide edge
multigraph, pick a random last-edge tree rooted at the final symbol, verify
connectivity, shuffle the remaining edge orderings, and walk the Eulerian
path.  Preserves exact mono- and di-nucleotide counts.
"""

from __future__ import annotations

import numpy as np


def dinucleotide_shuffle(seq: str, rng: np.random.Generator | None = None) -> str:
    """Return a random shuffle of ``seq`` preserving dinucleotide counts."""
    if rng is None:
        rng = np.random.default_rng()
    s = list(seq)
    if len(s) < 3:
        return seq

    last = s[-1]
    while True:
        # edge lists: for each symbol, the multiset of successors
        edges: dict[str, list[str]] = {}
        for a, b in zip(s[:-1], s[1:]):
            edges.setdefault(a, []).append(b)

        # choose a random "last edge" per non-terminal vertex
        ledge: dict[str, str] = {}
        for v, succs in edges.items():
            if v == last:
                continue
            i = rng.integers(len(succs))
            ledge[v] = succs.pop(i)

        # check: following last edges from every vertex must reach `last`
        def reaches(v: str) -> bool:
            seen = set()
            while v != last:
                if v in seen or v not in ledge:
                    return v == last
                seen.add(v)
                v = ledge[v]
            return True

        if all(reaches(v) for v in ledge):
            break
        # merge back and retry
        for v, w in ledge.items():
            edges[v].append(w)

    for succs in edges.values():
        rng.shuffle(succs)
    for v, w in ledge.items():
        edges.setdefault(v, []).append(w)  # last edges go last

    out = [s[0]]
    cur = s[0]
    while cur in edges and edges[cur]:
        cur = edges[cur].pop(0)
        out.append(cur)
    return "".join(out)
