"""SVM training/prediction on precomputed Gram matrices (libsvm/ equivalent)."""

from .solver import smo_solve, smo_solve_nu, SolverResult
from .variants import nu_svr_train, one_class_train, solve_nu_svc, svr_train
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
    "smo_solve_nu",
    "SolverResult",
    "solve_nu_svc",
    "nu_svr_train",
    "one_class_train",
    "svr_train",
    "SVCModel",
    "svm_train",
    "svm_predict_values",
    "svm_cross_validation",
    "save_model",
    "load_model",
    "load_sv_index",
]
