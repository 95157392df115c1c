"""Build padded device-ready feature tensors from parsed alignments.

This is the boundary between host-side streaming I/O (ragged alignments) and
the statically-shaped batched kernels: every example becomes fixed-shape
padded arrays plus a true length, stacked over the example axis, ready for
gather-by-index inside the jitted Gram engine.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..io.alphabet import N_RNA, encode
from ..io.profile import Alignment, profile_from_alignment


def pad_to(n: int, multiple: int = 8) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def string_kernel_features(
    alignments: Sequence[Alignment],
    *,
    weights: Sequence[np.ndarray] | None = None,
    pad_multiple: int = 8,
) -> dict[str, np.ndarray]:
    """Features for the profile string kernel: normalized column profiles.

    Profiles are normalized to sum 1 over the non-gap slots (the reference's
    subst_score divides by the count cross-product, which equals using
    normalized profiles).  Optional per-position ``weights`` (unpaired-loop
    profiles) ride along; absent weights default to 1.
    """
    n = len(alignments)
    lmax = pad_to(max(a.length for a in alignments), pad_multiple)
    prof = np.zeros((n, lmax, N_RNA), np.float32)
    wts = np.zeros((n, lmax), np.float32)
    lens = np.zeros(n, np.int32)
    for i, aln in enumerate(alignments):
        p = profile_from_alignment(aln)
        L = p.shape[0]
        base = p[:, :N_RNA]
        tot = base.sum(axis=1, keepdims=True)
        prof[i, :L] = np.where(tot > 0, base / np.where(tot > 0, tot, 1.0), 0.0)
        wts[i, :L] = 1.0 if weights is None else weights[i]
        lens[i] = L
    return {"profile": prof, "weight": wts, "length": lens}


def plain_string_features(
    seqs: Sequence[str], *, pad_multiple: int = 8
) -> dict[str, np.ndarray]:
    """Features for the exact-match string kernel: encoded code arrays."""
    n = len(seqs)
    lmax = pad_to(max(len(s) for s in seqs), pad_multiple)
    codes = np.zeros((n, lmax), np.uint8)
    lens = np.zeros(n, np.int32)
    for i, s in enumerate(seqs):
        c = encode(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return {"codes": codes, "length": lens}


def bpla_features(
    alignments: Sequence[Alignment],
    bpps: Sequence[np.ndarray],
    *,
    pad_multiple: int = 8,
) -> dict[str, np.ndarray]:
    """Features for the BPLA kernel: profiles + structural p_left/right/unpair.

    ``bpps``: per-example base-pair probability matrices over alignment
    columns (averaged over rows for alignments, as the reference's
    average_matrix does — /root/reference/common/bpmatrix.cpp:306-342).
    """
    from .bpla import bpla_profiles

    n = len(alignments)
    lmax = pad_to(max(a.length for a in alignments), pad_multiple)
    prof = np.zeros((n, lmax, N_RNA), np.float32)
    pl = np.zeros((n, lmax), np.float32)
    pr = np.zeros((n, lmax), np.float32)
    pu = np.zeros((n, lmax), np.float32)
    lens = np.zeros(n, np.int32)
    for i, (aln, bpp) in enumerate(zip(alignments, bpps)):
        p = profile_from_alignment(aln)
        L = p.shape[0]
        base = p[:, :N_RNA]
        tot = base.sum(axis=1, keepdims=True)
        prof[i, :L] = np.where(tot > 0, base / np.where(tot > 0, tot, 1.0), 0.0)
        a, b, c = bpla_profiles(bpp)
        pl[i, :L], pr[i, :L], pu[i, :L] = a, b, c
        lens[i] = L
    return {
        "profile": prof,
        "p_left": pl,
        "p_right": pr,
        "p_unpair": pu,
        "length": lens,
    }
