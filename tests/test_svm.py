"""SVM stack: SMO vs generic QP, KKT conditions, model I/O round-trip."""

import numpy as np
import pytest

from stem_kernel_tpu.svm.solver import smo_solve
from stem_kernel_tpu.svm.train import (
    sigmoid_train,
    svm_cross_validation,
    svm_predict_probability,
    svm_predict_values,
    svm_train,
)
from stem_kernel_tpu.svm.model import load_model, load_sv_index, save_model

rng = np.random.default_rng(3)


def random_problem(n=24, seed=3):
    r = np.random.default_rng(seed)
    X = r.normal(size=(n, 3))
    X[: n // 2] += 1.2
    y = np.concatenate([np.ones(n // 2), -np.ones(n - n // 2)])
    K = X @ X.T
    return K, y, X


def test_smo_kkt_conditions():
    K, y, _ = random_problem()
    C = 1.0
    res = smo_solve(K, y, -np.ones(len(y)), C, C, eps=1e-6)
    a = res.alpha
    assert np.all(a >= -1e-9) and np.all(a <= C + 1e-9)
    assert abs(np.dot(a, y)) < 1e-8
    # KKT: free SVs have y_i f(x_i) == 1
    f = K @ (a * y) - res.rho
    free = (a > 1e-6) & (a < C - 1e-6)
    if free.any():
        np.testing.assert_allclose(y[free] * f[free], 1.0, atol=1e-3)
    # bound conditions
    assert np.all(y[a < 1e-9] * f[a < 1e-9] >= 1 - 1e-3)
    assert np.all(y[a > C - 1e-9] * f[a > C - 1e-9] <= 1 + 1e-3)


def test_smo_matches_generic_qp():
    scipy_opt = pytest.importorskip("scipy.optimize")
    K, y, _ = random_problem(n=16, seed=7)
    C = 0.7
    res = smo_solve(K, y, -np.ones(len(y)), C, C, eps=1e-8)
    Q = np.outer(y, y) * K

    def obj(a):
        return 0.5 * a @ Q @ a - a.sum()

    def grad(a):
        return Q @ a - 1.0

    cons = [{"type": "eq", "fun": lambda a: a @ y, "jac": lambda a: y}]
    sol = scipy_opt.minimize(
        obj, np.zeros(len(y)), jac=grad, bounds=[(0, C)] * len(y),
        constraints=cons, method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
    )
    np.testing.assert_allclose(obj(res.alpha), sol.fun, rtol=1e-5, atol=1e-8)
    # decision values agree
    f_smo = K @ (res.alpha * y)
    f_qp = K @ (sol.x * y)
    np.testing.assert_allclose(f_smo, f_qp, atol=5e-3)


def test_train_predict_separable():
    K, y, _ = random_problem(n=30, seed=11)
    labels = ["+1" if v > 0 else "-1" for v in y]
    model = svm_train(K, labels, C=10.0)
    correct = 0
    for i in range(len(y)):
        pred, dec = svm_predict_values(model, K[i])
        correct += pred == labels[i]
    # the clusters overlap; the exact QP optimum misclassifies 4 train points
    assert correct >= len(y) - 4


def test_model_save_load_roundtrip(tmp_path):
    K, y, _ = random_problem(n=20, seed=13)
    labels = ["+1" if v > 0 else "-1" for v in y]
    model = svm_train(K, labels, C=1.0)
    path = str(tmp_path / "m.model")
    save_model(path, model)
    m2 = load_model(path)
    np.testing.assert_array_equal(model.sv_index, m2.sv_index)
    np.testing.assert_allclose(model.sv_coef, m2.sv_coef, rtol=1e-12)
    np.testing.assert_allclose(model.rho, m2.rho, rtol=1e-5)
    for i in range(len(y)):
        p1, d1 = svm_predict_values(model, K[i])
        p2, d2 = svm_predict_values(m2, K[i])
        assert p1 == p2
        np.testing.assert_allclose(d1, d2, rtol=1e-5)
    svs = load_sv_index([path])
    assert set(svs) == set(model.sv_index)


def test_probability_calibration():
    K, y, _ = random_problem(n=40, seed=17)
    labels = ["+1" if v > 0 else "-1" for v in y]
    model = svm_train(K, labels, C=1.0, probability=True)
    pred, prob = svm_predict_probability(model, K[0])
    assert prob.shape == (2,)
    np.testing.assert_allclose(prob.sum(), 1.0, rtol=1e-6)
    assert prob[model.labels.index(labels[0])] > 0.5


def test_sigmoid_train_monotone():
    dec = np.linspace(-2, 2, 50)
    y = np.where(dec + 0.1 * rng.normal(size=50) > 0, 1.0, -1.0)
    A, B = sigmoid_train(dec, y)
    assert A < 0  # higher decision value -> higher P(y=+1)


def test_cross_validation_runs():
    K, y, _ = random_problem(n=30, seed=23)
    labels = ["+1" if v > 0 else "-1" for v in y]
    preds = svm_cross_validation(K, labels, 5, C=10.0)
    acc = np.mean([p == l for p, l in zip(preds, labels)])
    assert acc > 0.7


def test_multiclass_ovo():
    r = np.random.default_rng(29)
    X = np.concatenate([r.normal(size=(10, 2)) + c for c in [(0, 3), (3, 0), (-3, -3)]])
    labels = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
    K = X @ X.T
    model = svm_train(K, labels, C=10.0)
    assert model.nr_class == 3
    correct = sum(svm_predict_values(model, K[i])[0] == labels[i] for i in range(30))
    assert correct >= 27


def test_one_class_svm():
    """One-class: KKT sum constraint, outliers scored below inliers."""
    from stem_kernel_tpu.svm.variants import one_class_train

    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (40, 3))
    X[-4:] += 6.0  # outliers
    sq = np.sum(X * X, 1)
    K = np.exp(-0.5 * (sq[:, None] + sq[None, :] - 2 * X @ X.T))
    nu = 0.2
    m = one_class_train(K, nu)
    # sum alpha == nu * l (the equality constraint's value, preserved by SMO)
    assert abs(m.sv_coef.sum() - nu * len(X)) < 1e-6
    dec = np.array([m.decision(K[i]) for i in range(len(X))])
    # every outlier scores below the median inlier
    assert dec[-4:].max() < np.median(dec[:-4])
    # about nu*l points end up outside (standard nu property, loose check)
    frac_out = float((dec < 0).mean())
    assert 0.05 <= frac_out <= 0.45


def test_epsilon_svr_fits_within_tube():
    from stem_kernel_tpu.svm.variants import svr_train

    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, (50, 4))
    w = np.array([1.0, -2.0, 0.5, 0.0])
    z = X @ w
    K = X @ X.T
    m = svr_train(K, z, C=100.0, p=0.1)
    pred = np.array([m.decision(K[i]) for i in range(len(X))])
    # linear-kernel SVR with generous C recovers the targets within ~tube
    assert np.max(np.abs(pred - z)) < 0.2


def test_variant_model_roundtrip(tmp_path):
    from stem_kernel_tpu.svm.variants import (
        load_variant_model, one_class_train, save_variant_model,
    )

    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, (20, 3))
    K = X @ X.T + 1.0
    m = one_class_train(K, 0.3)
    path = str(tmp_path / "oc.model")
    save_variant_model(path, m)
    m2 = load_variant_model(path)
    assert m2.svm_type == "one_class"
    np.testing.assert_allclose(m2.sv_coef, m.sv_coef, rtol=1e-12)
    assert abs(m2.decision(K[0]) - m.decision(K[0])) < 1e-9


def test_svm_tools_variant_cli(tmp_path):
    from stem_kernel_tpu.cli.svm_tools import predict_main, train_main
    from stem_kernel_tpu.gram.io import write_precomputed

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (30, 3))
    z = X @ np.array([1.0, 0.5, -1.0])
    K = X @ X.T
    mat = str(tmp_path / "km.dat")
    write_precomputed(mat, [f"{v:.6f}" for v in z], K)
    model = str(tmp_path / "svr.model")
    assert train_main(["-s", "3", "-c", "50", mat, model]) == 0
    out = str(tmp_path / "pred.txt")
    assert predict_main([mat, model, out]) == 0
    pred = np.array([float(l) for l in open(out)])
    assert np.corrcoef(pred, z)[0, 1] > 0.98


def test_svm_tools_module_subcommand_dispatch(tmp_path):
    """`python -m ...svm_tools train|predict ...` (the README workflow)
    dispatches to the right entry point; bare usage stays train."""
    from stem_kernel_tpu.cli.svm_tools import main
    from stem_kernel_tpu.gram.io import write_precomputed

    rng = np.random.default_rng(4)
    X = rng.normal(0, 1, (20, 3))
    y = np.where(X[:, 0] > 0, 1, -1)
    K = X @ X.T
    mat = str(tmp_path / "km.dat")
    write_precomputed(mat, [f"{v:+d}" for v in y], K)
    model = str(tmp_path / "km.model")
    assert main(["train", mat, model]) == 0
    out = str(tmp_path / "p.txt")
    assert main(["predict", mat, model, out]) == 0
    assert len(open(out).read().splitlines()) == 20
    # bare (no subcommand) = train, matrix-derived model name
    assert main([mat]) == 0
    import os
    assert os.path.exists(mat + ".model")


def test_nu_svc_matches_equivalent_c_svc():
    """LIBSVM property (svm.cpp solve_nu_svc): the scaled nu-SVC solution is
    the C-SVC solution at C = 1/r, so decision values must agree."""
    from stem_kernel_tpu.svm.variants import solve_nu_svc

    K, y, _ = random_problem(n=30, seed=11)
    coef, rho, c_equiv = solve_nu_svc(K, y, nu=0.4, eps=1e-8)
    f_nu = K @ coef - rho
    res = smo_solve(K, y, -np.ones(len(y)), c_equiv, c_equiv, eps=1e-8)
    f_c = K @ (res.alpha * y) - res.rho
    np.testing.assert_allclose(f_nu, f_c, atol=2e-3)


def test_nu_svc_nu_property():
    """nu upper-bounds the margin-error fraction and lower-bounds the SV
    fraction (Schoelkopf et al. 2000)."""
    from stem_kernel_tpu.svm.variants import solve_nu_svc

    K, y, _ = random_problem(n=40, seed=5)
    nu = 0.3
    coef, rho, c_equiv = solve_nu_svc(K, y, nu=nu, eps=1e-8)
    alpha = np.abs(coef)  # scaled alphas, bound = 1/r = c_equiv
    n = len(y)
    sv_frac = np.sum(alpha > 1e-8 * c_equiv) / n
    bound_frac = np.sum(alpha > c_equiv * (1 - 1e-6)) / n
    assert bound_frac <= nu + 1e-6
    assert sv_frac >= nu - 1e-6


def test_nu_svc_through_svm_train():
    K, y, _ = random_problem(n=24, seed=9)
    labels = ["+1" if v > 0 else "-1" for v in y]
    model = svm_train(K, labels, svm_type="nu_svc", nu=0.2, eps=1e-6)
    preds = [svm_predict_values(model, K[t])[0] for t in range(len(y))]
    acc = np.mean([p == l for p, l in zip(preds, labels)])
    assert acc > 0.9


def test_nu_svr_matches_epsilon_svr_at_attained_tube():
    """nu-SVR with derived epsilon = -r equals epsilon-SVR trained at that
    tube width (svm.cpp solve_nu_svr comment)."""
    from stem_kernel_tpu.svm.solver import smo_solve_nu
    from stem_kernel_tpu.svm.variants import nu_svr_train, svr_train

    r = np.random.default_rng(2)
    X = r.normal(size=(20, 2))
    z = X[:, 0] * 0.8 - X[:, 1] * 0.3 + 0.05 * r.normal(size=20)
    K = X @ X.T + 1e-6 * np.eye(20)

    # recover the attained epsilon from the raw nu solver
    l = len(z)
    C, nu = 2.0, 0.5
    K2 = np.tile(K, (2, 2))
    y2 = np.concatenate([np.ones(l), -np.ones(l)])
    p2 = np.concatenate([-z, z])
    alpha0 = np.zeros(2 * l)
    remain = C * nu * l / 2.0
    for i in range(l):
        alpha0[i] = alpha0[i + l] = min(C, remain)
        remain -= alpha0[i]
    _res, r_out = smo_solve_nu(K2, y2, p2, C, C, alpha0, eps=1e-8)
    eps_attained = -r_out
    assert eps_attained >= 0

    m_nu = nu_svr_train(K, z, C=C, nu=nu, eps=1e-8)
    m_eps = svr_train(K, z, C=C, p=eps_attained, eps=1e-8)
    f_nu = np.array([m_nu.decision(K[t]) for t in range(l)])
    f_eps = np.array([m_eps.decision(K[t]) for t in range(l)])
    np.testing.assert_allclose(f_nu, f_eps, atol=5e-3)


def test_nu_svr_cli(tmp_path):
    from stem_kernel_tpu.cli.svm_tools import predict_main, train_main
    from stem_kernel_tpu.gram.io import write_precomputed

    r = np.random.default_rng(4)
    X = r.normal(size=(16, 2))
    z = X[:, 0] - 0.5 * X[:, 1]
    K = X @ X.T + 1e-6 * np.eye(16)
    mat = tmp_path / "km.dat"
    write_precomputed(str(mat), [f"{v:.6f}" for v in z], K)
    model = tmp_path / "km.model"
    assert train_main(["-s", "4", "-c", "2.0", "-n", "0.5", str(mat), str(model)]) == 0
    out = tmp_path / "pred.txt"
    assert predict_main([str(mat), str(model), str(out)]) == 0
    preds = np.array([float(l) for l in out.read_text().split()])
    assert np.corrcoef(preds, z)[0, 1] > 0.9


def test_native_f32_kernel_path_matches_f64():
    # the f32 instantiation (round 5) must agree with the f64 solver on the
    # same data — it skips the O(n^2) dtype conversion, not any math
    from stem_kernel_tpu.native import available
    if not available():
        import pytest
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    n = 200
    X = rng.normal(0, 1, (n, 8))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    K32 = (Xn @ Xn.T).astype(np.float32)
    y = np.where(rng.random(n) > 0.5, 1.0, -1.0)
    p = np.full(n, -1.0)
    r32 = smo_solve(K32, y, p, 1.0, 1.0, eps=1e-4)
    r64 = smo_solve(K32.astype(np.float64), y, p, 1.0, 1.0, eps=1e-4)
    assert abs(r32.rho - r64.rho) < 1e-6
    assert abs(r32.obj - r64.obj) < 1e-3
    np.testing.assert_allclose(r32.alpha, r64.alpha, atol=1e-6)
