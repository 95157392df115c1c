"""Evaluation and data-prep utilities (reference utils/ equivalents)."""

from .roc import roc_curve_and_auc, acc_sp_sn
from .shuffle import dinucleotide_shuffle
from .transforms import rbf_from_gram, normalize_matrix, normalize_test_matrix

__all__ = [
    "roc_curve_and_auc",
    "acc_sp_sn",
    "dinucleotide_shuffle",
    "rbf_from_gram",
    "normalize_matrix",
    "normalize_test_matrix",
]
