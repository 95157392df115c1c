"""Exact partition-function oracle for the FULL Vienna-structured model.

Enumerates every pseudoknot-free secondary structure of a short sequence and
scores it by direct loop decomposition — written straight from the energy
model definition (fold/params.py docstrings / Vienna's E_Hairpin, E_IntLoop,
E_MLstem, E_ExtLoop structure), independently of fold/tables.py — then sums
weights.  Validates the McCaskill engines term-for-term; run with randomized
tables it exercises every component (mismatches, dangles, specials, int11/
21/22, NINIO, terminal-AU, gates).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from stem_kernel_tpu.fold.params import (
    EnergyParams,
    PAIR_TYPE,
    REV_PAIR,
    hairpin_score,
    loop_len_score,
)

NEG_INF = float("-inf")


def _pt(codes, i, j):
    return int(PAIR_TYPE[codes[i], codes[j]])


def _pair_allowed(codes: np.ndarray, i: int, j: int, params: EnergyParams) -> bool:
    pt = _pt(codes, i, j)
    if pt < 0 or j - i <= params.min_hairpin:
        return False
    if params.no_gu and pt in (2, 3):
        return False
    if params.no_lonely_pairs:
        n = len(codes)
        inner = (
            j - i > params.min_hairpin + 2
            and _pt(codes, i + 1, j - 1) >= 0
            and not (params.no_gu and _pt(codes, i + 1, j - 1) in (2, 3))
        )
        outer = (
            i >= 1
            and j + 1 < n
            and _pt(codes, i - 1, j + 1) >= 0
            and not (params.no_gu and _pt(codes, i - 1, j + 1) in (2, 3))
        )
        if not (inner or outer):
            return False
    return True


def enumerate_structures(
    codes: np.ndarray, params: EnergyParams
) -> list[tuple[tuple[int, int], ...]]:
    """All structures as tuples of (i, j) pairs, i < j, honouring pair gates."""
    n = len(codes)

    @lru_cache(maxsize=None)
    def rec(i: int, j: int) -> list[tuple]:
        if j - i < 0:
            return [()]
        if j - i + 1 <= params.min_hairpin:
            return [()]
        out = list(rec(i, j - 1))  # j unpaired
        for k in range(i, j - params.min_hairpin):
            if _pair_allowed(codes, k, j, params):
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
    """Loop-decomposition score (log-weight) of one structure; -inf if the
    structure is forbidden under the parameter gates/caps."""
    n = len(codes)
    pairs = sorted(pairs)
    pair_of = dict(pairs)
    s = codes

    def term(i, j):
        return float(params.terminal[_pt(s, i, j)])

    def children_of(i, j):
        out = []
        k = i + 1
        while k < j:
            if k in pair_of and pair_of[k] < j:
                out.append((k, pair_of[k]))
                k = pair_of[k] + 1
            else:
                k += 1
        return out

    score = 0.0
    # ---- exterior loop: d2 dangles + terminal per external branch ----
    ext_children = children_of(-1, n)  # sentinel walk over top level
    ext_unpaired_count = n - sum(l - k + 1 for (k, l) in ext_children)
    score += params.ext_unpaired * ext_unpaired_count
    for (k, l) in ext_children:
        pt = _pt(s, k, l)
        score += term(k, l) + params.ext_paired
        if k > 0 and l < n - 1:
            score += float(params.mismatch_e[pt, s[k - 1], s[l + 1]])
        elif k > 0:
            score += float(params.dangle5[pt, s[k - 1]])
        elif l < n - 1:
            score += float(params.dangle3[pt, s[l + 1]])

    for (i, j) in pairs:
        pt = _pt(s, i, j)
        assert pt >= 0
        is_gu = pt in (2, 3)
        score += float(params.pair_bonus[pt])
        if w_extra is not None:
            score += float(w_extra[i, j])
        children = children_of(i, j)

        if not children:
            # ---- hairpin ----
            if params.no_closing_gu and is_gu:
                return NEG_INF
            size = j - i - 1
            sub = "".join("ACGU"[c] for c in s[i : j + 1])
            if sub in params.special_hairpins:
                score += float(params.special_hairpins[sub])
                continue
            score += float(hairpin_score(params, size))
            if size == params.min_hairpin and not params.mismatch_all_hairpins:
                score += term(i, j)
            else:
                score += float(params.mismatch_h[pt, s[i + 1], s[j - 1]])
        elif len(children) == 1:
            # ---- interior/bulge/stack: Vienna E_IntLoop case split ----
            (k, l) = children[0]
            pt2 = _pt(s, k, l)
            rev2 = int(REV_PAIR[pt2])
            n1, n2 = k - i - 1, j - l - 1
            ns, nl = min(n1, n2), max(n1, n2)
            if nl == 0:
                score += float(params.stack[pt, pt2])
            elif nl + ns > params.max_interior:
                return NEG_INF
            elif ns == 0:
                score += float(loop_len_score(params.bulge_len, params.lxc, nl))
                if nl == 1:
                    if params.bulge1_no_stack:
                        score += term(i, j) + term(k, l)
                    else:
                        score += float(params.stack[pt, pt2])
                    if params.bulge1_nuc is not None:
                        bulged = s[i + 1] if n1 == 1 else s[j - 1]
                        score += float(params.bulge1_nuc[bulged])
                else:
                    score += term(i, j) + term(k, l)
            elif ns == 1 and nl == 1:
                score += float(params.int11[pt, rev2, s[i + 1], s[j - 1]])
            elif ns == 1 and nl == 2:
                if n1 == 1:  # 1x2
                    score += float(
                        params.int21[pt, rev2, s[i + 1], s[j - 2], s[j - 1]]
                    )
                else:  # 2x1: swapped orientation
                    score += float(
                        params.int21[rev2, pt, s[j - 1], s[i + 1], s[i + 2]]
                    )
            elif ns == 2 and nl == 2:
                score += float(
                    params.int22[pt, rev2, s[i + 1], s[i + 2], s[j - 2], s[j - 1]]
                )
            else:
                if (params.interior_explicit is not None
                        and ns <= 4 and nl <= 4):
                    score += float(params.interior_explicit[ns, nl])
                else:
                    score += float(
                        loop_len_score(params.interior_len, params.lxc, ns + nl)
                    )
                    if params.interior_asym_table is not None:
                        at = params.interior_asym_table
                        score += float(at[min(nl - ns, len(at) - 1)])
                    else:
                        score += max(params.ninio * (nl - ns), params.ninio_max)
                if ns == 1:
                    mm = params.mismatch_i1n
                elif ns == 2 and nl == 3:
                    mm = params.mismatch_i23
                else:
                    mm = params.mismatch_i
                score += float(mm[pt, s[i + 1], s[j - 1]])
                score += float(mm[rev2, s[l + 1], s[k - 1]])
        else:
            # ---- multiloop (d2 stems) ----
            if params.no_closing_gu and is_gu:
                return NEG_INF
            unpaired = (j - i - 1) - sum(l - k + 1 for (k, l) in children)
            score += (
                params.ml_close
                + params.ml_branch
                + term(i, j)
                + float(params.mismatch_m[int(REV_PAIR[pt]), s[j - 1], s[i + 1]])
                + params.ml_unpaired * unpaired
            )
            for (k, l) in children:
                score += (
                    params.ml_branch
                    + term(k, l)
                    + float(params.mismatch_m[_pt(s, k, l), s[k - 1], s[l + 1]])
                )
    return score


def brute_force_Z_bpp(
    codes: np.ndarray,
    params: EnergyParams,
    w_extra: np.ndarray | None = None,
) -> tuple[float, np.ndarray]:
    """(logZ, bpp matrix) by direct enumeration under the full model."""
    n = len(codes)
    structures = enumerate_structures(codes, params)
    scores = np.array(
        [structure_score(codes, st, params, w_extra) for st in structures]
    )
    m = scores.max()
    ws = np.exp(scores - m)
    Z = ws.sum()
    bpp = np.zeros((n, n))
    for st, w in zip(structures, ws):
        for (i, j) in st:
            bpp[i, j] += w
    return float(m + np.log(Z)), bpp / Z


def random_params(seed: int, scale: float = 0.7) -> EnergyParams:
    """Randomized tables: every term nonzero so equivalence tests cover all
    code paths regardless of the default values' realism."""
    from stem_kernel_tpu.fold.params import N_PAIR, default_params

    rng = np.random.default_rng(seed)
    p = default_params()
    r = lambda *shape: rng.uniform(-scale, scale, shape)
    p.stack = p.stack + r(N_PAIR, N_PAIR)
    p.pair_bonus = r(N_PAIR)
    p.terminal = p.terminal + r(N_PAIR) * 0.3
    p.mismatch_h = r(N_PAIR, 4, 4)
    p.mismatch_i = r(N_PAIR, 4, 4)
    p.mismatch_i1n = r(N_PAIR, 4, 4)
    p.mismatch_i23 = r(N_PAIR, 4, 4)
    p.mismatch_m = r(N_PAIR, 4, 4)
    p.mismatch_e = r(N_PAIR, 4, 4)
    p.dangle5 = r(N_PAIR, 4)
    p.dangle3 = r(N_PAIR, 4)
    p.int11 = p.int11 + r(N_PAIR, N_PAIR, 4, 4)
    p.int21 = p.int21 + r(N_PAIR, N_PAIR, 4, 4, 4)
    p.int22 = p.int22 + r(N_PAIR, N_PAIR, 4, 4, 4, 4)
    p.ninio = -abs(rng.uniform(0.2, 1.0))
    p.ninio_max = -abs(rng.uniform(2.0, 4.0))
    p.ml_close = rng.uniform(-6.0, -4.0)
    p.ml_branch = rng.uniform(-1.0, -0.2)
    p.ml_unpaired = rng.uniform(-0.2, 0.0)
    p.special_hairpins = {
        "CGAAAG": 2.0 + float(rng.uniform(-0.5, 0.5)),  # tetraloop
        "GUUCGC": 1.5 + float(rng.uniform(-0.5, 0.5)),
        "AGAAAU": 1.0,
        "GGAAAC": 1.2,  # triloop-sized? no: 4-loop
        "CAACGG": 0.8,
        "GUGAAAAC": 1.0,  # hexaloop
    }
    return p
