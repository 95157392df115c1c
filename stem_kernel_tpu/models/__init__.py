"""Kernel functions: the RNA convolution/alignment kernel families."""

from .ribosum_data import RIBOSUM_S, RIBOSUM_P
from .string_kernel import (
    StringKernel,
    gap_weighted_string_kernel,
    profile_subst_scores,
    ribosum_subst_table,
    match_mismatch_table,
)

__all__ = [
    "RIBOSUM_S",
    "RIBOSUM_P",
    "StringKernel",
    "gap_weighted_string_kernel",
    "profile_subst_scores",
    "ribosum_subst_table",
    "match_mismatch_table",
]
