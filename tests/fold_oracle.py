"""Exact partition-function oracle by exhaustive structure enumeration.

Enumerates every pseudoknot-free secondary structure (min hairpin size 3,
canonical pairs only) of a short sequence, scores each with the SAME loop
decomposition as stem_kernel_tpu.fold.params, and sums weights directly.
Used to validate the McCaskill inside/outside DP cell-for-cell.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from stem_kernel_tpu.fold.params import (
    EnergyParams,
    PAIR_TYPE,
    hairpin_score,
    interior_score,
)


def enumerate_structures(codes: np.ndarray, min_hairpin: int = 3) -> list[tuple[tuple[int, int], ...]]:
    """All structures as tuples of (i, j) pairs, i < j."""
    n = len(codes)

    @lru_cache(maxsize=None)
    def rec(i: int, j: int) -> list[tuple]:
        # structures of subsequence [i..j]
        if j - i < 0:
            return [()]
        if j - i + 1 <= min_hairpin:
            return [()]
        out = list(rec(i, j - 1))  # j unpaired
        for k in range(i, j - min_hairpin):
            if PAIR_TYPE[codes[k], codes[j]] >= 0:
                for left in rec(i, k - 1):
                    for inner in rec(k + 1, j - 1):
                        out.append(left + inner + ((k, j),))
        return out

    return rec(0, n - 1)


def structure_score(
    codes: np.ndarray,
    pairs: tuple[tuple[int, int], ...],
    params: EnergyParams,
    w_extra: np.ndarray | None = None,
) -> float:
    """Loop-decomposition score (log-weight) of one structure."""
    n = len(codes)
    pairs = sorted(pairs)
    pair_of = {}
    for (i, j) in pairs:
        pair_of[i] = j
    score = 0.0
    for (i, j) in pairs:
        pt = PAIR_TYPE[codes[i], codes[j]]
        assert pt >= 0
        score += params.pair_bonus[pt]
        if w_extra is not None:
            score += w_extra[i, j]
        # find directly nested pairs inside (i, j)
        children = []
        k = i + 1
        while k < j:
            if k in pair_of and pair_of[k] < j:
                children.append((k, pair_of[k]))
                k = pair_of[k] + 1
            else:
                k += 1
        if not children:
            score += float(hairpin_score(params, j - i - 1))
        elif len(children) == 1:
            (k, l) = children[0]
            n1, n2 = k - i - 1, j - l - 1
            if n1 == 0 and n2 == 0:
                score += float(params.stack[pt, PAIR_TYPE[codes[k], codes[l]]])
            else:
                score += float(interior_score(params, n1, n2))
        else:
            unpaired = (j - i - 1) - sum(l - k + 1 for (k, l) in children)
            score += (
                params.ml_close
                + params.ml_branch * (len(children) + 1)
                + params.ml_unpaired * unpaired
            )
    return score


def brute_force_Z_bpp(
    codes: np.ndarray,
    params: EnergyParams,
    w_extra: np.ndarray | None = None,
) -> tuple[float, np.ndarray]:
    """(logZ, bpp matrix) by direct enumeration."""
    n = len(codes)
    structures = enumerate_structures(codes, params.min_hairpin)
    scores = np.array([structure_score(codes, s, params, w_extra) for s in structures])
    m = scores.max()
    ws = np.exp(scores - m)
    Z = ws.sum()
    bpp = np.zeros((n, n))
    for s, w in zip(structures, ws):
        for (i, j) in s:
            bpp[i, j] += w
    return float(m + np.log(Z)), bpp / Z
