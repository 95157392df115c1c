"""Sequence-indexed energy lookup tables for the McCaskill engines.

Precomputes every (n, n) log-score LUT the Vienna-structured recursions
need, so the scan bodies of both engines (log-space oracle and scaled
linear-domain) stay gather-free: each term reads one row of a span-layout
table per step.

All LUTs are in [i, j] layout (j = partner column); engines convert to span
layout as needed.  Values are log-weights; impossible entries are NEG
(finite, so f32 arithmetic never produces NaN from inf - inf).

Table semantics (Vienna loop-energy structure, see fold.params):
  wpair        pair admissibility + per-pair bonus + optional extra weight
  stack        helix stacking, outer (i,j) over inner (i+1, j-1)
  hairpin      FULL hairpin score for closing pair (i, j): length term +
               (size 3: terminal-AU; size > 3: mismatch_h) + special
               tri/tetra/hexaloop total-score overrides + closing-GU gate
  bulge1_l/r   bulge of size 1 (left/right): length + stacking of the two
               pairs (Vienna E_IntLoop nl==1 keeps the stack term)
  int11/21l/21r/22
               special small-interior tables, inner pair position fixed
  mm_i_out     generic-interior mismatch of the OUTER pair; *_in of the
               inner pair (reversed orientation); same for i1n / i23
  term_out/in  terminal-AU factors for bulges >= 2
  ml_close     multiloop closing-stem score: a + b + terminal + mismatch_m
               (reversed, looking into the loop) + closing-GU gate
  ml_stem      multiloop branch: b + terminal + mismatch_m (d2)
  ext_stem     exterior branch: terminal + mismatch_e / dangle5 / dangle3
               depending on neighbor existence (d2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .params import EnergyParams, N_PAIR, PAIR_TYPE, REV_PAIR, hairpin_score

NEG = -1e30


def _f(x):
    """Sanitize -inf -> NEG so downstream f32 arithmetic never NaNs.

    Tables are prepared in host numpy f64; jnp.asarray then takes JAX's
    default float width (f64 under jax_enable_x64, f32 otherwise)."""
    return jnp.asarray(np.maximum(np.asarray(x, np.float64), NEG))


def build_luts(
    codes: jax.Array, length: jax.Array, params: EnergyParams, w_extra,
    pt_override=None,
) -> dict[str, jax.Array]:
    """All (n, n) log-score LUTs for one sequence (jit-traceable).

    ``pt_override`` — optional (n, n) int matrix of pair types (-1 = cannot
    pair) replacing the code-derived types.  Used by the row-aware ALIFOLD
    gate (the reference reaches alipf_fold's per-row pair admissibility,
    /root/reference/common/bpmatrix.cpp:355-397): a column pair is typed by
    the majority canonical row pair instead of the consensus sequence.

    ``codes`` with ndim == 2 means (R, n) ALIGNMENT ROWS (gap/unknown >= 4)
    and switches to Hofacker per-row energy averaging — see
    :func:`_build_luts_averaged`.
    """
    if codes.ndim == 2:
        return _build_luts_averaged(codes, length, params, w_extra, pt_override)
    n = codes.shape[0]
    ii = jnp.arange(n)
    dmat = ii[None, :] - ii[:, None]  # j - i

    if pt_override is None:
        pt_full = jnp.asarray(PAIR_TYPE)[codes[:, None], codes[None, :]]
    else:
        pt_full = pt_override.astype(jnp.int32)  # (n, n)
    pt = pt_full
    if params.no_gu:
        pt = jnp.where((pt == 2) | (pt == 3), -1, pt)
    in_len = ii[None, :] < length
    can = (pt >= 0) & (dmat > params.min_hairpin) & in_len

    if params.no_lonely_pairs:
        # Vienna's pf noLP heuristic: (i, j) may pair only when it can stack
        # with a canonical neighbour pair (i+1, j-1) or (i-1, j+1).
        def shift2(m, di, dj):
            return jnp.roll(jnp.roll(m, -di, axis=0), -dj, axis=1)

        inner_ok = shift2(can, 1, -1) & (dmat > params.min_hairpin + 2)
        outer_pt = shift2(pt_full, -1, 1)  # pair type of (i-1, j+1)
        outer_ok = (
            (outer_pt >= 0)
            & (ii[:, None] >= 1)
            & (ii[None, :] + 1 < length)
        )
        can = can & (inner_ok | outer_ok)

    bonus = jnp.asarray(params.pair_bonus)
    wpair = jnp.where(can, bonus[jnp.clip(pt, 0)], NEG)
    if w_extra is not None:
        wpair = jnp.where(can, wpair + w_extra, NEG)

    ptc = jnp.clip(pt, 0)
    rev = jnp.asarray(REV_PAIR)
    is_gu = (pt == 2) | (pt == 3)
    gu_gate = jnp.where(is_gu & params.no_closing_gu, NEG, 0.0)

    # neighbour codes (clipped reads; validity comes from pair gating)
    c_ip1 = codes[jnp.clip(ii + 1, 0, n - 1)]  # s[i+1]
    c_ip2 = codes[jnp.clip(ii + 2, 0, n - 1)]
    c_im1 = codes[jnp.clip(ii - 1, 0)]
    c_jm1 = c_im1  # s[j-1] uses the same shifted vector indexed by j
    c_jm2 = codes[jnp.clip(ii - 2, 0)]
    c_jp1 = c_ip1

    def pair_at(di: int, dj: int):
        """Pair type of (i+di, j+dj) on the (i, j) grid, -1 out of range."""
        t = jnp.roll(jnp.roll(pt_full, -di, axis=0), -dj, axis=1)
        valid = ((ii + di)[:, None] >= 0) & ((ii + dj)[None, :] < n) & \
                ((ii + di)[:, None] < n) & ((ii + dj)[None, :] >= 0)
        return jnp.where(valid, t, -1)

    # ---- stacking (outer (i,j) / inner (i+1, j-1)) ----
    pt_in = pair_at(1, -1)
    stack_t = _f(params.stack)[ptc, jnp.clip(pt_in, 0)]
    stack = jnp.where((pt >= 0) & (pt_in >= 0), stack_t, NEG)

    # ---- hairpin (full score per closing pair) ----
    sizes = dmat - 1
    hp_len_np = hairpin_score(params, np.arange(max(2 * n, 32)))
    hp_len = _f(hp_len_np)[jnp.clip(sizes, 0)]
    mm_h = _f(params.mismatch_h)[ptc, c_ip1[:, None], c_jm1[None, :]]
    term = _f(params.terminal)[ptc]
    if params.mismatch_all_hairpins:  # CONTRAfold: mismatch at every size
        hp_mm = mm_h
    else:
        hp_mm = jnp.where(sizes == params.min_hairpin, term, mm_h)
    hairpin = hp_len + hp_mm + gu_gate
    # special loops override the whole score (length+mismatch), keeping gates
    if params.special_hairpins:
        hairpin = _apply_special_hairpins(hairpin, codes, dmat, params, gu_gate)
    hairpin = jnp.where(can, jnp.maximum(hairpin, NEG), NEG)

    # ---- bulge-1 (Vienna: keeps stacking; CONTRAfold: helix closings +
    #      bulged-base identity instead) ----
    blen1 = float(np.maximum(params.bulge_len[1], NEG))
    b1nuc = (jnp.zeros((4,)) if params.bulge1_nuc is None
             else _f(params.bulge1_nuc))
    term_v = _f(params.terminal)

    def bulge1_score(pt_inner, bulged_base):
        if params.bulge1_no_stack:
            pair_part = term_v[ptc] + term_v[jnp.clip(pt_inner, 0)]
        else:
            pair_part = _f(params.stack)[ptc, jnp.clip(pt_inner, 0)]
        return blen1 + pair_part + b1nuc[bulged_base]

    pt_b1l = pair_at(2, -1)  # inner (i+2, j-1); bulged base s[i+1]
    bulge1_l = jnp.where(
        (pt >= 0) & (pt_b1l >= 0),
        bulge1_score(pt_b1l, c_ip1[:, None]),
        NEG,
    )
    pt_b1r = pair_at(1, -2)  # inner (i+1, j-2); bulged base s[j-1]
    bulge1_r = jnp.where(
        (pt >= 0) & (pt_b1r >= 0),
        bulge1_score(pt_b1r, c_jm1[None, :]),
        NEG,
    )

    # ---- special small interiors ----
    def rev_at(di, dj):
        t = pair_at(di, dj)
        return jnp.where(t >= 0, rev[jnp.clip(t, 0)], -1), t

    r11, t11 = rev_at(2, -2)
    int11 = jnp.where(
        (pt >= 0) & (t11 >= 0),
        _f(params.int11)[ptc, jnp.clip(r11, 0), c_ip1[:, None], c_jm1[None, :]],
        NEG,
    )
    # 1x2: inner (i+2, j-3); Vienna int21[type][type_2][si1][sq1][sj1]
    r21l, t21l = rev_at(2, -3)
    int21_l = jnp.where(
        (pt >= 0) & (t21l >= 0),
        _f(params.int21)[
            ptc, jnp.clip(r21l, 0), c_ip1[:, None], c_jm2[None, :], c_jm1[None, :]
        ],
        NEG,
    )
    # 2x1: inner (i+3, j-2); Vienna int21[type_2][type][sq1][si1][sp1]
    r21r, t21r = rev_at(3, -2)
    int21_r = jnp.where(
        (pt >= 0) & (t21r >= 0),
        _f(params.int21)[
            jnp.clip(r21r, 0), ptc, c_jm1[None, :], c_ip1[:, None], c_ip2[:, None]
        ],
        NEG,
    )
    # 2x2: inner (i+3, j-3); int22[type][type_2][si1][sp1][sq1][sj1]
    r22, t22 = rev_at(3, -3)
    int22 = jnp.where(
        (pt >= 0) & (t22 >= 0),
        _f(params.int22)[
            ptc, jnp.clip(r22, 0),
            c_ip1[:, None], c_ip2[:, None], c_jm2[None, :], c_jm1[None, :]
        ],
        NEG,
    )

    # ---- interior mismatch factors (outer on (i,j); inner reversed) ----
    def mm_pair(tab):
        t = _f(tab)
        out = jnp.where(pt >= 0, t[ptc, c_ip1[:, None], c_jm1[None, :]], NEG)
        # inner factor for pair (k, l): reversed type, neighbours s[l+1], s[k-1]
        inner = jnp.where(
            pt >= 0, t[rev[ptc], c_jp1[None, :], c_im1[:, None]], NEG
        )
        return out, inner

    mm_i_out, mm_i_in = mm_pair(params.mismatch_i)
    mm_1n_out, mm_1n_in = mm_pair(params.mismatch_i1n)
    mm_23_out, mm_23_in = mm_pair(params.mismatch_i23)

    term_out = jnp.where(pt >= 0, term, NEG)  # bulges >= 2: terminal both ends
    term_in = term_out  # terminal depends only on pair class (symmetric)

    # ---- multiloop stems (dangle model d2) ----
    mm_m = _f(params.mismatch_m)
    # closing stem looks INTO the loop: reversed type, neighbours s[j-1], s[i+1]
    ml_close = jnp.where(
        pt >= 0,
        params.ml_close + params.ml_branch + term
        + mm_m[rev[ptc], c_jm1[None, :], c_ip1[:, None]] + gu_gate,
        NEG,
    )
    # branch stem (k, l): neighbours s[k-1], s[l+1] (always inside the loop)
    ml_stem = jnp.where(
        pt >= 0,
        params.ml_branch + term + mm_m[ptc, c_im1[:, None], c_jp1[None, :]],
        NEG,
    )

    # ---- exterior stems: mismatch_e / dangles depending on neighbours ----
    mm_e = _f(params.mismatch_e)
    d5 = _f(params.dangle5)[ptc, c_im1[:, None]]
    d3 = _f(params.dangle3)[ptc, c_jp1[None, :]]
    both = mm_e[ptc, c_im1[:, None], c_jp1[None, :]]
    has5 = (ii[:, None] >= 1) & jnp.ones((1, n), bool)
    has3 = jnp.ones((n, 1), bool) & ((ii[None, :] + 1) < length)
    dang = jnp.where(
        has5 & has3, both, jnp.where(has5, d5, jnp.where(has3, d3, 0.0))
    )
    ext_stem = jnp.where(pt >= 0, term + dang + params.ext_paired, NEG)

    return dict(
        wpair=wpair, stack=stack, hairpin=hairpin,
        bulge1_l=bulge1_l, bulge1_r=bulge1_r,
        int11=int11, int21_l=int21_l, int21_r=int21_r, int22=int22,
        mm_i_out=mm_i_out, mm_i_in=mm_i_in,
        mm_1n_out=mm_1n_out, mm_1n_in=mm_1n_in,
        mm_23_out=mm_23_out, mm_23_in=mm_23_in,
        term_out=term_out, term_in=term_in,
        ml_close=ml_close, ml_stem=ml_stem, ext_stem=ext_stem,
    )


def _apply_special_hairpins(hairpin, codes, dmat, params: EnergyParams, gu_gate):
    """Override hairpin scores for special tri/tetra/hexaloops.

    Vienna stores specials as <closing 5' base><loop><closing 3' base>
    strings whose energy REPLACES the length+mismatch score entirely.
    """
    n = codes.shape[0]
    ii = jnp.arange(n)
    out = hairpin
    by_size: dict[int, list[tuple[np.ndarray, float]]] = {}
    for seq, score in params.special_hairpins.items():
        size = len(seq) - 2  # loop size without the closing pair
        if size <= 0:
            continue
        enc = np.asarray([_code_of(ch) for ch in seq], np.int32)
        if (enc < 0).any():
            continue
        by_size.setdefault(size, []).append((enc, float(score)))
    for size, entries in by_size.items():
        span = size + 1  # j - i
        # window of codes starting at i, length size + 2
        win = jnp.stack(
            [codes[jnp.clip(ii + k, 0, n - 1)] for k in range(size + 2)], axis=1
        )  # (n, size+2)
        valid = ii + size + 1 < n
        score_vec = jnp.full((n,), NEG)
        for enc, sc in entries:
            hit = jnp.all(win == jnp.asarray(enc)[None, :], axis=1) & valid
            score_vec = jnp.where(hit, sc, score_vec)
        # scatter onto the diagonal j = i + span (gates still apply)
        on_diag = (ii[None, :] - ii[:, None]) == span
        out = jnp.where(
            on_diag & (score_vec[:, None] > NEG / 2),
            score_vec[:, None] + gu_gate,
            out,
        )
    return out


def _code_of(ch: str) -> int:
    return {"A": 0, "C": 1, "G": 2, "U": 3, "T": 3}.get(ch.upper(), -1)


def _build_luts_averaged(rows, length, params: EnergyParams, w_extra,
                         pt_override=None) -> dict[str, jax.Array]:
    """True-alifold LUTs: per-row energies, averaged across alignment rows.

    Vienna's alipf_fold (reached by the reference at
    /root/reference/common/bpmatrix.cpp:355-397) evaluates every loop
    energy PER SEQUENCE and Boltzmann-weights the average over rows
    (Hofacker 2002).  Here each row gets its own full LUT set (its own
    pair types, stacks, mismatches, dangles), and every table entry is the
    masked mean over the rows for which it is defined — so an alignment
    whose rows disagree on a helix gets averaged stack/mismatch/closing
    energies, not the consensus sequence's.

    Documented deviations from alipf_fold:
    - loop SIZES are measured in alignment columns for every row (Vienna
      maps to each row's ungapped coordinates via a2s[]);
    - rows that cannot form a canonical pair at (i, j) are excluded from
      that entry's average (Vienna scores them as nonstandard pairs); the
      covariance term's non-canonical penalty (``w_extra`` from
      bpmatrix.alifold_covariance) carries that penalty instead;
    - gapped NEIGHBOUR positions are imputed with the column consensus for
      mismatch/dangle lookups (pair admissibility itself never is).

    All-gap rows contribute to no entry, which makes all-gap row PADDING
    exact — batched alignments of different depths can share one (R, n)
    pad shape.
    """
    R, n = rows.shape
    gap = rows >= 4
    onehot = ((rows[..., None] == jnp.arange(4)) & ~gap[..., None])
    consensus = jnp.argmax(onehot.sum(0), axis=-1)
    filled = jnp.where(gap, consensus, jnp.clip(rows, 0, 3)).astype(jnp.int32)
    PT = jnp.asarray(PAIR_TYPE)
    rc = jnp.clip(rows, 0, 3)
    pt_r = PT[rc[:, :, None], rc[:, None, :]]
    pt_r = jnp.where(gap[:, :, None] | gap[:, None, :], -1, pt_r)

    luts_r = jax.vmap(
        lambda c, p: build_luts(c, length, params, None, pt_override=p)
    )(filled, pt_r)

    out: dict[str, jax.Array] = {}
    for k, v in luts_r.items():
        valid = v > NEG / 2
        cnt = valid.sum(axis=0)
        s = jnp.where(valid, v, 0.0).sum(axis=0)
        out[k] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), NEG)

    wp = out["wpair"]
    if w_extra is not None:
        wp = jnp.where(wp > NEG / 2, wp + w_extra, NEG)
    if pt_override is not None:
        # row-aware admissibility gate (majority pair type, -1 = no row pairs)
        wp = jnp.where(pt_override >= 0, wp, NEG)
    out["wpair"] = wp
    return out
