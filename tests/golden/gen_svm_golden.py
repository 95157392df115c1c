"""Generate LIBSVM interop goldens via sklearn's embedded libsvm.

sklearn.svm.SVC(kernel='precomputed') is a direct wrapper around the real
LIBSVM solver, so its decision values are reference-grade goldens for our SMO.
Run once; outputs committed under tests/golden/.
"""
import numpy as np
from sklearn.svm import SVC

rng = np.random.default_rng(42)
n = 60
X = rng.normal(size=(n, 5))
X[: n // 2] += 0.9  # overlapping classes -> bounded + free SVs
y = np.array([1] * (n // 2) + [-1] * (n // 2))
K = X @ X.T

C = 1.5
clf = SVC(kernel="precomputed", C=C, tol=1e-6)
clf.fit(K, y)
dec = clf.decision_function(K)  # positive => classes_[1] == +1

# PRECOMPUTED matrix in LIBSVM text format (label 0:idx 1:v ...)
with open("tests/golden/svm_precomputed.txt", "w") as f:
    for i in range(n):
        vals = " ".join(f"{j+1}:{K[i, j]:.12g}" for j in range(n))
        f.write(f"{y[i]:+d} 0:{i+1} {vals}\n")

np.savez(
    "tests/golden/svm_libsvm_golden.npz",
    y=y, C=np.float64(C),
    dec=dec,                      # decision_function, + => label +1
    pred=clf.predict(K),
    support=clf.support_,         # SV indices (0-based)
    dual_coef=clf.dual_coef_[0],  # y_i * alpha_i at support_
    intercept=clf.intercept_[0],
)
print("classes_", clf.classes_, "n_sv", clf.support_.size, "obj-ish intercept", clf.intercept_)
