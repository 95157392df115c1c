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


def alifold_bpp(aln: Alignment, opts: BPMatrixOptions | None = None) -> np.ndarray:
    """Consensus fold over alignment columns (ALIFOLD stand-in).

    Folds the column consensus: each row is mapped to alignment coordinates
    (gaps as A's that cannot pair are approximated by the per-row averaging
    path; here we fold the majority-rule consensus sequence).  A full
    covariance-scored alifold is future work; the reference treats ALIFOLD as
    one of several interchangeable BPP producers.
    """
    opts = opts or BPMatrixOptions()
    from ..io.profile import profile_from_alignment

    prof = profile_from_alignment(aln)
    consensus_codes = np.argmax(prof[:, :4], axis=1).astype(np.uint8)
    seq = "".join("acgu"[c] for c in consensus_codes)
    return fold_sequences([seq], opts)[0]
