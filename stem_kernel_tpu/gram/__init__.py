"""Gram-matrix engine: batched pairwise kernel evaluation, sharded over a mesh."""

from .engine import PairKernelEngine, normalize_gram
from .io import write_precomputed, read_precomputed, write_norm

__all__ = [
    "PairKernelEngine",
    "normalize_gram",
    "write_precomputed",
    "read_precomputed",
    "write_norm",
]
