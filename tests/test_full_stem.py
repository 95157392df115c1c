"""Full O(n^4) stem kernel: wavefront formulation vs direct recursion oracle."""

import numpy as np
import jax.numpy as jnp

from stem_kernel_tpu.io.alphabet import encode
from stem_kernel_tpu.models.full_stem import full_stem_kernel, pair_weights

from full_stem_oracle import full_stem_ref

rng = np.random.default_rng(17)

PAIRS = [
    ("gggaaaccc", "ggcaaagcc"),
    ("gcgcaaagcgc", "gggaaaccc"),
    ("acguacgu", "ugcaugca"),
]


def run_pair(a, b, gap=0.8, stack=1.0, subst=0.5, use_bpp=False):
    ca, cb = encode(a), encode(b)
    n = max(len(a), len(b)) + 1
    x = np.zeros((1, n), np.uint8)
    y = np.zeros((1, n), np.uint8)
    x[0, : len(ca)] = ca
    y[0, : len(cb)] = cb
    if use_bpp:
        from stem_kernel_tpu.fold.bpmatrix import fold_sequences

        bx_small = fold_sequences([a])[0]
        by_small = fold_sequences([b])[0]
        wx = pair_weights(ca, len(a), bpp=bx_small, bp_bound=0.01)
        wy = pair_weights(cb, len(b), bpp=by_small, bp_bound=0.01)
    else:
        wx = pair_weights(ca, len(a))
        wy = pair_weights(cb, len(b))
    bx = np.zeros((1, n, n))
    by = np.zeros((1, n, n))
    bx[0, : len(a), : len(a)] = wx
    by[0, : len(b), : len(b)] = wy
    got = float(
        np.asarray(
            full_stem_kernel(
                jnp.asarray(x), jnp.asarray(y),
                jnp.asarray([len(a)]), jnp.asarray([len(b)]),
                jnp.asarray(bx, jnp.float32), jnp.asarray(by, jnp.float32),
                gap, stack, subst,
            )
        )[0]
    )
    want = full_stem_ref(ca, cb, wx, wy, gap, stack, subst)
    return got, want


def test_matches_oracle_wobble_pairs():
    for a, b in PAIRS:
        got, want = run_pair(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-4, err_msg=f"{a} vs {b}")


def test_matches_oracle_bpp_weights():
    got, want = run_pair("gggaaaccc", "ggcaaagcc", use_bpp=True)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_symmetry():
    g1, _ = run_pair("gggaaaccc", "ggcaaagcc")
    g2, _ = run_pair("ggcaaagcc", "gggaaaccc")
    np.testing.assert_allclose(g1, g2, rtol=1e-4)


def test_batched_padding():
    a, b = "gggaaaccc", "ggcaaagcc"
    ca, cb = encode(a), encode(b)
    n = 14  # extra padding
    x = np.zeros((2, n), np.uint8)
    y = np.zeros((2, n), np.uint8)
    x[0, : len(ca)] = ca
    x[1, : len(cb)] = cb
    y[0, : len(cb)] = cb
    y[1, : len(ca)] = ca
    bx = np.zeros((2, n, n), np.float32)
    by = np.zeros((2, n, n), np.float32)
    bx[0, : len(a), : len(a)] = pair_weights(ca, len(a))
    bx[1, : len(b), : len(b)] = pair_weights(cb, len(b))
    by[0, : len(b), : len(b)] = pair_weights(cb, len(b))
    by[1, : len(a), : len(a)] = pair_weights(ca, len(a))
    vals = np.asarray(
        full_stem_kernel(
            jnp.asarray(x), jnp.asarray(y),
            jnp.asarray([len(a), len(b)]), jnp.asarray([len(b), len(a)]),
            jnp.asarray(bx), jnp.asarray(by), 0.8, 1.0, 0.5,
        )
    )
    want = full_stem_ref(ca, cb, pair_weights(ca, len(a)), pair_weights(cb, len(b)), 0.8, 1.0, 0.5)
    np.testing.assert_allclose(vals[0], want, rtol=1e-4)
    np.testing.assert_allclose(vals[1], want, rtol=1e-4)  # symmetric kernel


def test_band_restricts_and_wide_band_matches_full():
    a, b = "gggaaaccc", "ggcaaagcc"
    ca, cb = encode(a), encode(b)
    n = max(len(a), len(b)) + 1
    x = np.zeros((1, n), np.uint8); x[0, : len(ca)] = ca
    y = np.zeros((1, n), np.uint8); y[0, : len(cb)] = cb
    bx = np.zeros((1, n, n), np.float32); by = np.zeros((1, n, n), np.float32)
    bx[0, : len(a), : len(a)] = pair_weights(ca, len(a))
    by[0, : len(b), : len(b)] = pair_weights(cb, len(b))
    args = (jnp.asarray(x), jnp.asarray(y), jnp.asarray([len(a)]), jnp.asarray([len(b)]),
            jnp.asarray(bx), jnp.asarray(by), 0.8, 1.0, 0.5)
    full = float(np.asarray(full_stem_kernel(*args))[0])
    wide = float(np.asarray(full_stem_kernel(*args, band=len(b)))[0])
    np.testing.assert_allclose(wide, full, rtol=1e-5)
    narrow = float(np.asarray(full_stem_kernel(*args, band=1))[0])
    assert narrow <= full + 1e-6
