"""BPP matrices for alignments: fold-and-average, the BPMatrix facade.

Equivalent of the reference's BPMatrix layer
(/root/reference/common/bpmatrix.{h,cpp}): one interface producing a base-pair
probability matrix for a single sequence or a multiple alignment, selected by
method:

- FOLD: McCaskill partition function per (ungapped) sequence
  (bpmatrix.cpp:151-177); for alignments, each row is folded ungapped and the
  matrices are averaged after mapping through per-row gap index maps
  (average_matrix, bpmatrix.cpp:306-342);
- ALIFOLD: a consensus fold over alignment columns — implemented as a fold of
  the alignment's profile with pair weights averaged over rows (RNAalifold's
  covariance scoring is approximated by averaging per-row pair scores);
- IMPORT: precomputed matrices supplied by the caller (the pf-scale-file
  spirit: enables exact-parity experiments against Vienna-derived BPPs).

Batched host API: sequences are grouped by padded length and folded on device
in batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.alphabet import encode, erase_gap
from ..io.profile import Alignment, index_map
from .mccaskill import mccaskill_bpp_batch
from .params import EnergyParams, default_params


@dataclass
class BPMatrixOptions:
    """Folding options (BPMatrix::Options, common/bpmatrix.cpp:45-93)."""

    alifold: bool = False
    n_samples: int = 0  # >0 -> stochastic sampling (SFOLD)
    params: EnergyParams | None = None
    pad_multiple: int = 0  # 0 -> geometric buckets (compile-count bounded)

    def resolved_params(self) -> EnergyParams:
        return self.params if self.params is not None else default_params()


def _pad_len(n: int, multiple: int) -> int:
    """Padded length bucket.  ``multiple`` 0 picks geometric buckets
    (32, 48, 64, 96, 128, ...): every fold length compiles one of O(log n)
    program variants instead of one per 16-mer bucket — XLA compile time,
    not padding FLOPs, dominates varied-length corpora."""
    if multiple > 0:
        return max(multiple, -(-n // multiple) * multiple)
    b = 32
    while b < n:
        b = b * 3 // 2 if (b & (b - 1)) == 0 else -(-b * 4 // 3)
    return b


def fold_sequences(
    seqs: list[str], opts: BPMatrixOptions | None = None
) -> list[np.ndarray]:
    """BPP matrix per (ungapped) sequence, batched by padded length.

    With ``n_samples > 0`` the SFOLD path estimates BPPs by stochastic
    traceback sampling instead of the exact outside pass
    (bpmatrix.cpp:179-232).
    """
    opts = opts or BPMatrixOptions()
    params = opts.resolved_params()
    if opts.n_samples > 0:
        from .sampling import sfold_bpp

        return [sfold_bpp(s, opts.n_samples, params) for s in seqs]
    groups: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        groups.setdefault(_pad_len(len(s), opts.pad_multiple), []).append(i)
    out: list[np.ndarray | None] = [None] * len(seqs)
    for lpad, idxs in sorted(groups.items()):
        codes = np.zeros((len(idxs), lpad), np.uint8)
        lens = np.zeros(len(idxs), np.int32)
        for r, i in enumerate(idxs):
            c = encode(seqs[i])
            codes[r, : len(c)] = c
            lens[r] = len(c)
        bpps, _ = mccaskill_bpp_batch(codes, lens, params=params)
        for r, i in enumerate(idxs):
            L = lens[r]
            out[i] = np.asarray(bpps[r, :L, :L], dtype=np.float64)
    return out  # type: ignore[return-value]


def average_bpp(aln: Alignment, row_bpps: list[np.ndarray]) -> np.ndarray:
    """Average per-row BPP matrices over alignment columns.

    Each row's ungapped matrix is scattered to alignment-column coordinates
    through its gap index map, then averaged over rows (average_matrix,
    /root/reference/common/bpmatrix.cpp:306-342).
    """
    L = aln.length
    acc = np.zeros((L, L))
    for row, bpp in zip(aln.rows, row_bpps):
        idx = index_map(row)  # column -> ungapped position or -1
        cols = np.flatnonzero(idx >= 0)
        sub = bpp[np.ix_(idx[cols], idx[cols])]
        acc[np.ix_(cols, cols)] += sub
    return acc / max(len(aln.rows), 1)


def bpp_for_alignment(
    aln: Alignment, opts: BPMatrixOptions | None = None
) -> np.ndarray:
    """BPP matrix over alignment columns (the reference's MData input)."""
    opts = opts or BPMatrixOptions()
    if opts.alifold:
        return alifold_bpp(aln, opts)
    ungapped = aln.ungapped_rows()
    row_bpps = fold_sequences(ungapped, opts)
    return average_bpp(aln, row_bpps)


def bpp_for_alignments(
    alignments: list[Alignment], opts: BPMatrixOptions | None = None
) -> list[np.ndarray]:
    """BPP matrices for many alignments, folding all rows in shared batches."""
    opts = opts or BPMatrixOptions()
    if opts.alifold:
        return [alifold_bpp(a, opts) for a in alignments]
    flat: list[str] = []
    spans: list[tuple[int, int]] = []
    for a in alignments:
        rows = a.ungapped_rows()
        spans.append((len(flat), len(rows)))
        flat.extend(rows)
    all_bpps = fold_sequences(flat, opts)
    out = []
    for a, (start, cnt) in zip(alignments, spans):
        out.append(average_bpp(a, all_bpps[start : start + cnt]))
    return out


def alifold_covariance(
    aln: Alignment, *, cov_weight: float = 1.6, noncanon_penalty: float = 1.6
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(consensus_codes, w_extra, pt_major, row_codes) for a covariance fold.

    ``row_codes`` is the (R, L) per-row nucleotide matrix (gap/other = 4)
    consumed by the true-alifold averaged LUTs.

    RNAalifold-style column-pair scoring (Hofacker 2002, the engine behind
    the reference's ALIFOLD method via alipf_fold,
    /root/reference/common/bpmatrix.cpp:355-397), expressed in log-weight
    space as a per-(i, j) additive term for the partition function:

      cov(i, j)  = sum over unordered row pairs of the Hamming distance
                   between their (canonical) base pairs, / C(R, 2)
                   — compensatory double mutations score 2, single
                   consistent mutations 1;
      pen(i, j)  = fraction of rows whose (i, j) is neither canonical nor
                   fully gapped (0.25 for half-gapped rows, 1.0 otherwise);
      w_extra    = cov_weight * cov - noncanon_penalty * pen, and NEG where
                   no row can pair (i, j).

    Computed with O(36 n^2) pair-type count contractions, not O(R^2 n^2)
    row-pair loops.
    """
    from .params import PAIR_TYPE, N_PAIR

    L = aln.length
    R = aln.n_rows
    code = np.full((R, L), 4, np.int8)  # 4 = gap/other
    lut = {"a": 0, "c": 1, "g": 2, "u": 3, "t": 3}
    for r, row in enumerate(aln.rows):
        for i, ch in enumerate(row.lower()):
            code[r, i] = lut.get(ch, 4)

    # per-row pair types over the (i, j) grid: -1 noncanon, -2 any gap
    pt_tab = np.full((5, 5), -1, np.int8)
    pt_tab[:4, :4] = PAIR_TYPE
    pt_tab[4, :] = -2
    pt_tab[:, 4] = -2
    pt = pt_tab[code[:, :, None], code[:, None, :]]  # (R, L, L)

    # counts per canonical pair type
    cnt = np.zeros((N_PAIR, L, L), np.float32)
    for t in range(N_PAIR):
        cnt[t] = (pt == t).sum(axis=0)
    n_canon = cnt.sum(axis=0)
    n_gap = (pt == -2).sum(axis=0).astype(np.float32)
    n_bad = R - n_canon - n_gap

    # Hamming distances between pair types (CG GC GU UG AU UA as 2-mers)
    pair_strs = ["cg", "gc", "gu", "ug", "au", "ua"]
    D = np.array([[sum(a != b for a, b in zip(p, q)) for q in pair_strs]
                  for p in pair_strs], np.float32)
    n_rowpairs = max(R * (R - 1) / 2.0, 1.0)
    cov = np.einsum("tij,uij,tu->ij", cnt, cnt, D) / 2.0 / n_rowpairs

    pen = (n_bad + 0.25 * n_gap * (n_gap < R)) / max(R, 1)
    w_extra = cov_weight * cov - noncanon_penalty * pen
    w_extra = np.where(n_canon > 0, w_extra, -1e30).astype(np.float32)

    # Row-aware pair gate (alipf_fold admits a pair when ANY row pairs,
    # /root/reference/common/bpmatrix.cpp:355-397): pair type per column
    # pair = the majority canonical row pair, -1 only when NO row pairs.
    pt_major = np.where(n_canon > 0, np.argmax(cnt, axis=0), -1).astype(np.int32)

    from ..io.profile import profile_from_alignment

    prof = profile_from_alignment(aln)
    consensus = np.argmax(prof[:, :4], axis=1).astype(np.uint8)
    return consensus, w_extra, pt_major, code


def alifold_bpp(aln: Alignment, opts: BPMatrixOptions | None = None) -> np.ndarray:
    """Covariance-scored TRUE-ALIFOLD over alignment columns (ALIFOLD).

    Hofacker's alipf_fold recipe, the engine the reference reaches at
    /root/reference/common/bpmatrix.cpp:355-397: every loop energy is
    evaluated PER ROW (each row's own pair types, stacks, mismatches and
    dangles) and averaged across rows — see tables._build_luts_averaged —
    plus per-(i, j) covariance log-weight adjustments from
    :func:`alifold_covariance` (compensatory mutations reward a pair,
    inconsistent rows penalize it, unpairable columns are excluded).  The
    pair gate is ROW-AWARE, like alipf_fold's: a column pair is admissible
    when ANY row pairs canonically (typed via ``pt_override``), with
    minority support discounted by the w_extra non-canonical penalty."""
    opts = opts or BPMatrixOptions()
    from .mccaskill_scaled import mccaskill_bpp_batch_scaled

    _, w_extra, pt_major, rows = alifold_covariance(aln)
    bpp, _ = mccaskill_bpp_batch_scaled(
        rows[None, :, :].astype(np.int32), np.array([aln.length]),
        opts.resolved_params(), w_extra=w_extra[None],
        pt_override=pt_major[None],
    )
    return np.asarray(bpp[0], np.float64)
