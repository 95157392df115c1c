"""Direct 4-index recursion of the full stem kernel (oracle).

Cell-for-cell translation of full_dp
(/root/reference/stem_kernel/stem_kernel.cpp:280-351) in NumPy, for tiny
sequences.
"""

from __future__ import annotations

import numpy as np

K0, K1, K2, K3, G0, G1, G2, G3 = range(8)


def full_stem_ref(x, y, bp_x, bp_y, gap, stack, subst, bp_bound=0.0):
    """x, y: code arrays; bp_x/bp_y: pair weight matrices (0 = disallowed)."""
    n, m = len(x), len(y)
    g = gap
    dp = {}

    def block(state, i, j, fill=0.0):
        dp[(state, i, j)] = np.full((m + 1, m + 1), fill)
        return dp[(state, i, j)]

    for j in range(n + 1):
        b0 = block(K0, j, j, 1.0)
        g0 = block(G0, j, j)
        for s in (K1, K2, K3, G1, G2, G3):
            block(s, j, j)
        for l in range(m + 1):
            g0[l, l] = 1.0
            for k in range(l - 1, -1, -1):
                g0[k, l] = g0[k + 1, l] * g
        if j == 0:
            continue
        for i in range(j - 1, -1, -1):
            bp_ij = bp_x[i, j - 1]
            t = {s: block(s, i, j) for s in range(8)}
            for l in range(m + 1):
                t[K0][l, l] = 1.0
                t[G0][l, l] = dp[(G0, i + 1, j)][l, l] * g
                if l == 0:
                    continue
                for k in range(l - 1, -1, -1):
                    # dp_init
                    t[K0][k, l] = dp[(K0, i, j - 1)][k, l]
                    t[G0][k, l] = dp[(G0, i, j - 1)][k, l] * g
                    t[K1][k, l] = dp[(K1, i + 1, j)][k, l]
                    t[G1][k, l] = dp[(G1, i + 1, j)][k, l] * g
                    t[K2][k, l] = t[K2][k, l - 1]
                    t[G2][k, l] = t[G2][k, l - 1] * g
                    t[K3][k, l] = t[K3][k + 1, l]
                    t[G3][k, l] = t[G3][k + 1, l] * g
                    if bp_ij > bp_bound:
                        bp_kl = bp_y[k, l - 1]
                        if bp_kl > bp_bound:
                            inner = dp[(G0, i + 1, j - 1)][k + 1, l - 1]
                            if x[i] == y[k] and x[j - 1] == y[l - 1]:
                                t[K3][k, l] += inner * stack * bp_ij * bp_kl
                                t[G3][k, l] += inner
                            else:
                                t[K3][k, l] += inner * stack * subst * bp_ij * bp_kl
                    # dp_update
                    t[K2][k, l] += t[K3][k, l]
                    t[G2][k, l] += t[G3][k, l]
                    t[K1][k, l] += t[K2][k, l]
                    t[G1][k, l] += t[G2][k, l]
                    t[K0][k, l] += t[K1][k, l]
                    t[G0][k, l] += t[G1][k, l]
    return dp[(K0, 0, n)][0, m]
