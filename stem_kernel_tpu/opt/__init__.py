"""Hyperparameter optimization: bound-constrained L-BFGS, smoothed-AUC
objective with KKT hypergradients, and classic-kernel optimizers."""

from .lbfgsb import LBFGSB, LOWER_BOUND, BOTH_BOUNDS, UPPER_BOUND, UNBOUND
from .gradient import auc_gradient_fold, smoothed_auc_delta
from .optimizer import optimize_kernel_params, cv_split

__all__ = [
    "LBFGSB",
    "LOWER_BOUND",
    "BOTH_BOUNDS",
    "UPPER_BOUND",
    "UNBOUND",
    "auc_gradient_fold",
    "smoothed_auc_delta",
    "optimize_kernel_params",
    "cv_split",
]
