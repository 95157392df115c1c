"""Cross-implementation parity vs real LIBSVM (via sklearn's embedded copy).

The reference's own correctness strategy is cross-implementation comparison
(SURVEY.md §4); its SVM stack is LIBSVM itself (/root/reference/libsvm/).
Goldens in tests/golden/ were produced once by sklearn.svm.SVC — a thin
wrapper over the genuine LIBSVM SMO solver — and committed (see
tests/golden/gen_svm_golden.py), so this test needs no sklearn at runtime.
"""

import os

import numpy as np
import pytest

from stem_kernel_tpu.gram.io import read_precomputed
from stem_kernel_tpu.svm.train import svm_cross_validation, svm_predict_values, svm_train

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(GOLDEN, "svm_libsvm_golden.npz"))
    labels, K = read_precomputed(os.path.join(GOLDEN, "svm_precomputed.txt"))
    return data, labels, K


def test_read_precomputed_real_format(golden):
    data, labels, K = golden
    assert labels == [f"{v:+d}" for v in data["y"]]
    n = len(labels)
    assert K.shape == (n, n)
    np.testing.assert_allclose(K, K.T, atol=1e-9)


def test_decision_values_match_libsvm(golden):
    data, labels, K = golden
    model = svm_train(K, labels, C=float(data["C"]), eps=1e-6)
    # LIBSVM convention: dec > 0 -> first training label (+1 here), which is
    # also sklearn's classes_[1]; the two signs agree for this golden.
    dec = np.array([svm_predict_values(model, K[i])[1][0] for i in range(len(labels))])
    np.testing.assert_allclose(dec, data["dec"], atol=1e-5)
    preds = [svm_predict_values(model, K[i])[0] for i in range(len(labels))]
    np.testing.assert_array_equal(
        np.array([int(p) for p in preds]), data["pred"]
    )


def test_support_vectors_match_libsvm(golden):
    data, labels, K = golden
    model = svm_train(K, labels, C=float(data["C"]), eps=1e-6)
    assert set(model.sv_index.tolist()) == set(data["support"].tolist())
    # dual coefficients (y_i * alpha_i), compared at matching indices
    ours = dict(zip(model.sv_index.tolist(), model.sv_coef[0].tolist()))
    for idx, coef in zip(data["support"].tolist(), data["dual_coef"].tolist()):
        assert abs(ours[idx] - coef) < 1e-5
    assert abs(-model.rho[0] - float(data["intercept"])) < 1e-5


def test_cross_validation_is_stratified():
    rng = np.random.default_rng(1)
    n_a, n_b = 40, 8  # unbalanced: plain permutation folds often miss class b
    X = np.concatenate([rng.normal(size=(n_a, 3)), rng.normal(size=(n_b, 3)) + 2.0])
    labels = ["+1"] * n_a + ["-1"] * n_b
    K = X @ X.T
    preds = svm_cross_validation(K, labels, 4, C=1.0)
    assert all(p in ("+1", "-1") for p in preds)
    # reproduce the fold assignment logic to assert per-fold class balance
    from stem_kernel_tpu.svm import train as tr

    rng2 = np.random.default_rng(0)
    fold_of = np.empty(len(labels), dtype=np.int64)
    nxt = 0
    for cls in dict.fromkeys(labels):
        idx = np.flatnonzero(np.asarray(labels, dtype=object) == cls)
        idx = rng2.permutation(idx)
        for i in idx:
            fold_of[i] = nxt % 4
            nxt += 1
    for f in range(4):
        fold_labels = [labels[i] for i in np.flatnonzero(fold_of == f)]
        assert fold_labels.count("-1") == 2  # 8 minority points over 4 folds
