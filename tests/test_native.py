"""Native C++ components vs Python fallbacks (skipped if not built)."""

import numpy as np
import pytest

import stem_kernel_tpu.native as nat

pytestmark = pytest.mark.skipif(not nat.available(), reason="native lib not built")


def test_native_smo_matches_python():
    from stem_kernel_tpu.svm import solver as sol

    r = np.random.default_rng(3)
    n = 40
    X = r.normal(size=(n, 3))
    X[: n // 2] += 1.2
    y = np.concatenate([np.ones(n // 2), -np.ones(n - n // 2)])
    K = X @ X.T
    res_native = sol.smo_solve(K, y, -np.ones(n), 1.0, 1.0, eps=1e-6)
    orig = nat.smo_solve_native
    nat.smo_solve_native = lambda *a, **k: None
    try:
        res_py = sol.smo_solve(K, y, -np.ones(n), 1.0, 1.0, eps=1e-6)
    finally:
        nat.smo_solve_native = orig
    np.testing.assert_allclose(res_native.obj, res_py.obj, rtol=1e-8)
    np.testing.assert_allclose(res_native.alpha, res_py.alpha, atol=1e-5)
    np.testing.assert_allclose(res_native.rho, res_py.rho, atol=1e-5)


def test_native_dag_scan_matches_python():
    from stem_kernel_tpu.fold.bpmatrix import fold_sequences
    from stem_kernel_tpu.models.dag import _dag_topology

    for seq in ["gggaaaccc", "gggcuauuagcucaguggua"]:
        bpp = fold_sequences([seq])[0]
        res_native = _dag_topology(bpp, len(seq), 0.01)
        orig = nat.dag_scan_native
        nat.dag_scan_native = lambda *a, **k: None
        try:
            res_py = _dag_topology(bpp, len(seq), 0.01)
        finally:
            nat.dag_scan_native = orig
        for a, b in zip(res_native, res_py):
            np.testing.assert_array_equal(a, b)
