"""Simpal palindrome kernel: factorized matmul form vs direct dict kernel."""

import numpy as np

from stem_kernel_tpu.fold.bpmatrix import fold_sequences
from stem_kernel_tpu.io.alphabet import encode
from stem_kernel_tpu.models.simpal import (
    _COMP,
    pal_features,
    simpal_gram,
    simpal_kernel_fn,
)

rng = np.random.default_rng(21)

SEQS = ["gggcgcaagcuugaaagcgccc", "ggcacgaaagugcc", "acguacguacguacgu"]


def direct_kernel(Fa, Fb, seed, tolerance):
    """Reference semantics: pairwise loop over nonzero (kmer, dist) entries."""

    def kmer_digits(k):
        return [(k // (4**p)) % 4 for p in range(seed - 1, -1, -1)]

    total = 0.0
    ka, da = np.nonzero(Fa)
    kb, db = np.nonzero(Fb)
    for k1, d1 in zip(ka, da):
        for k2, d2 in zip(kb, db):
            ham = sum(a != b for a, b in zip(kmer_digits(k1), kmer_digits(k2)))
            if tolerance < 0 or ham <= tolerance:
                total += np.exp(-abs(int(d1) - int(d2))) * Fa[k1, d1] * Fb[k2, d2]
    return total


def test_factorized_matches_direct():
    bpps = fold_sequences(SEQS)
    feats = np.stack([pal_features(s, b, max_dist=60) for s, b in zip(SEQS, bpps)])
    assert feats.sum() > 0, "no palindrome candidates found"
    G = simpal_gram(feats, tolerance=1, max_dist=60)
    for i in range(3):
        for j in range(3):
            want = direct_kernel(feats[i], feats[j], 3, 1)
            np.testing.assert_allclose(G[i, j], want, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(G, G.T, rtol=1e-5)


def test_pal_features_hairpin():
    # perfect hairpin: ggg-cgc loop aaa, strong candidate expected
    seq = "gggcgcaaagcgccc"
    bpp = fold_sequences([seq])[0]
    F = pal_features(seq, bpp, max_dist=60)
    assert F.sum() > 0


def test_kernel_fn_matches_gram():
    import jax.numpy as jnp

    bpps = fold_sequences(SEQS)
    feats = np.stack([pal_features(s, b, max_dist=60) for s, b in zip(SEQS, bpps)])
    G = simpal_gram(feats, tolerance=1, max_dist=60)
    kfn = simpal_kernel_fn(3, 1, 60)
    vals = np.asarray(kfn({"pal": jnp.asarray(feats)}, {"pal": jnp.asarray(feats[[1, 2, 0]])}))
    np.testing.assert_allclose(vals, [G[0, 1], G[1, 2], G[2, 0]], rtol=1e-5)


def test_simpal_cli(tmp_path):
    from stem_kernel_tpu.cli import simpal as simpal_cli
    from stem_kernel_tpu.gram.io import read_precomputed

    fa = tmp_path / "a.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(SEQS)))
    out = str(tmp_path / "km.dat")
    assert simpal_cli.main(["-m", "60", out, "+1", str(fa)]) == 0
    labels, g = read_precomputed(out)
    assert g.shape == (3, 3)


def test_stem_kernel_cli(tmp_path):
    from stem_kernel_tpu.cli import stem_kernel as sk_cli
    from stem_kernel_tpu.gram.io import read_precomputed

    fa = tmp_path / "a.fa"
    fa.write_text(">a\ngggaaaccc\n>b\nggcaaagcc\n")
    out = str(tmp_path / "km.dat")
    assert sk_cli.main([out, "+1", str(fa)]) == 0
    labels, g = read_precomputed(out)
    assert g.shape == (2, 2)
    np.testing.assert_allclose(g, g.T, rtol=1e-4)
