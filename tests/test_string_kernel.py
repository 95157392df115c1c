"""String kernel: batched scan implementation vs brute-force oracle."""

import numpy as np
import pytest

from stem_kernel_tpu.io.alphabet import encode
from stem_kernel_tpu.io.profile import profile_from_alignment
from stem_kernel_tpu.models.string_kernel import (
    StringKernel,
    gap_weighted_string_kernel,
    plain_string_kernel,
    profile_subst_scores,
    ribosum_subst_table,
    match_mismatch_table,
)

from reference_dp import string_kernel_ref

rng = np.random.default_rng(0)


def random_seq(n):
    return "".join(rng.choice(list("acgu"), size=n))


def test_matches_bruteforce_random_scores():
    gap = 0.8
    B, L = 4, 12
    S = rng.uniform(0.1, 1.5, size=(B, L, L)).astype(np.float32)
    got = np.asarray(gap_weighted_string_kernel(S, gap))
    want = np.array([string_kernel_ref(S[b], gap) for b in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_padding_invariance():
    gap = 0.7
    S_small = rng.uniform(0.1, 1.2, size=(1, 6, 5)).astype(np.float32)
    S_big = np.zeros((1, 10, 10), dtype=np.float32)
    S_big[:, :6, :5] = S_small
    got = np.asarray(gap_weighted_string_kernel(S_big, gap))[0]
    want = string_kernel_ref(S_small[0], gap)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_symmetry():
    k = StringKernel(0.8, alpha=0.2)
    a, b = random_seq(15), random_seq(11)
    L = 16
    pa = np.zeros((1, L, 4), np.float32)
    pb = np.zeros((1, L, 4), np.float32)
    pa[0, :15] = profile_from_alignment([a])[:, :4]
    pb[0, :11] = profile_from_alignment([b])[:, :4]
    kab = np.asarray(k(pa, [15], pb, [11]))[0]
    kba = np.asarray(k(pb, [11], pa, [15]))[0]
    np.testing.assert_allclose(kab, kba, rtol=1e-6)


def test_profile_subst_matches_direct():
    subst = ribosum_subst_table(0.2)
    a, b = "acguacg", "ggcaau"
    pa = profile_from_alignment([a])[:, :4][None]
    pb = profile_from_alignment([b])[:, :4][None]
    S = np.asarray(profile_subst_scores(pa, pb, subst))[0]
    ca, cb = encode(a), encode(b)
    want = subst[np.ix_(ca, cb)]
    np.testing.assert_allclose(S, want, rtol=1e-6)


def test_plain_string_kernel_identical_seq_vs_manual():
    # exact-match kernel on tiny strings, vs direct recursion
    x, y = "acg", "acg"
    gap = 1.0
    cx, cy = encode(x)[None], encode(y)[None]
    got = float(np.asarray(plain_string_kernel(cx, [3], cy, [3], gap))[0])
    eq = (encode(x)[:, None] == encode(y)[None, :]).astype(np.float64)
    want = string_kernel_ref(eq * gap**2, gap)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_match_mismatch_table():
    t = match_mismatch_table(1.0, 0.8)
    assert t[0, 0] == 1.0 and t[0, 1] == np.float32(0.8)


def test_psd_small_gram():
    # kernel Gram matrix over random sequences must be PSD
    k = StringKernel(0.6, match=1.0, mismatch=0.8)
    seqs = [random_seq(rng.integers(8, 14)) for _ in range(6)]
    L = max(len(s) for s in seqs)
    P = np.zeros((len(seqs), L, 4), np.float32)
    lens = []
    for i, s in enumerate(seqs):
        P[i, : len(s)] = profile_from_alignment([s])[:, :4]
        lens.append(len(s))
    G = np.zeros((6, 6))
    for i in range(6):
        for j in range(6):
            G[i, j] = np.asarray(
                k(P[i : i + 1], [lens[i]], P[j : j + 1], [lens[j]])
            )[0]
    np.testing.assert_allclose(G, G.T, rtol=1e-5)
    w = np.linalg.eigvalsh(G)
    assert w.min() > -1e-6 * abs(w).max()
