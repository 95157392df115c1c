"""Direct log-space pair-HMM recursions (oracle for models/phmm)."""

from __future__ import annotations

import numpy as np

from stem_kernel_tpu.models.phmm import TRANS
from stem_kernel_tpu.models.ribosum_data import RIBOSUM_S

M, IX, IY = 0, 1, 2
NEG = -np.inf


def lse(*vals):
    arr = np.array(vals, dtype=float)
    mx = arr.max()
    if mx == NEG:
        return NEG
    return mx + np.log(np.exp(arr - mx).sum())


def forward_ref(x: np.ndarray, y: np.ndarray):
    """x, y: code arrays.  Returns fw (3, n+1, m+1), logZ."""
    n, m = len(x), len(y)
    t = TRANS.astype(float)
    fw = np.full((3, n + 1, m + 1), NEG)
    fw[M, 0, 0] = 0.0
    for i in range(1, n + 1):
        fw[IX, i, 0] = lse(*[fw[s, i - 1, 0] + t[s, IX] for s in range(3)])
    for j in range(1, m + 1):
        fw[IY, 0, j] = lse(*[fw[s, 0, j - 1] + t[s, IY] for s in range(3)])
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            e = RIBOSUM_S[x[i - 1], y[j - 1]]
            fw[M, i, j] = e + lse(*[fw[s, i - 1, j - 1] + t[s, M] for s in range(3)])
            fw[IX, i, j] = lse(*[fw[s, i - 1, j] + t[s, IX] for s in range(3)])
            fw[IY, i, j] = lse(*[fw[s, i, j - 1] + t[s, IY] for s in range(3)])
    return fw, fw[M, n, m]


def backward_ref(x: np.ndarray, y: np.ndarray):
    n, m = len(x), len(y)
    t = TRANS.astype(float)
    bk = np.full((3, n + 1, m + 1), NEG)
    bk[M, n, m] = 0.0
    for i in range(n, 0, -1):
        for j in range(m, 0, -1):
            e = RIBOSUM_S[x[i - 1], y[j - 1]]
            for s in range(3):
                bk[s, i - 1, j - 1] = lse(bk[s, i - 1, j - 1], bk[M, i, j] + e + t[s, M])
                bk[s, i - 1, j] = lse(bk[s, i - 1, j], bk[IX, i, j] + t[s, IX])
                bk[s, i, j - 1] = lse(bk[s, i, j - 1], bk[IY, i, j] + t[s, IY])
    for j in range(m, 0, -1):
        for s in range(3):
            bk[s, 0, j - 1] = lse(bk[s, 0, j - 1], bk[IY, 0, j] + t[s, IY])
    for i in range(n, 0, -1):
        for s in range(3):
            bk[s, i - 1, 0] = lse(bk[s, i - 1, 0], bk[IX, i, 0] + t[s, IX])
    return bk
