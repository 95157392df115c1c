"""SVM training/prediction on precomputed Gram matrices (libsvm/ equivalent)."""

from .solver import smo_solve, SolverResult
from .train import (
    SVCModel,
    svm_train,
    svm_predict_values,
    svm_predict_probability,
    svm_cross_validation,
    sigmoid_train,
)
from .model import save_model, load_model, load_sv_index

__all__ = [
    "smo_solve",
    "SolverResult",
    "SVCModel",
    "svm_train",
    "svm_predict_values",
    "svm_cross_validation",
    "save_model",
    "load_model",
    "load_sv_index",
]
