"""Pair HMM: batched log-space fwd/bwd vs direct recursion oracle."""

import numpy as np
import jax.numpy as jnp

from stem_kernel_tpu.io.alphabet import encode
from stem_kernel_tpu.models.phmm import (
    alignment_constraints,
    map_path,
    phmm_backward,
    phmm_forward,
    phmm_posterior,
)

from phmm_oracle import backward_ref, forward_ref

SEQ_PAIRS = [
    ("acgu", "acgu"),
    ("ggcaaagcc", "ggcagcc"),
    ("aaccggu", "uuggcca"),
]


def pack(a, b):
    n = max(len(a), len(b)) + 2
    x = np.zeros((1, n), np.uint8)
    y = np.zeros((1, n), np.uint8)
    x[0, : len(a)] = encode(a)
    y[0, : len(b)] = encode(b)
    return (jnp.asarray(x), jnp.asarray([len(a)]),
            jnp.asarray(y), jnp.asarray([len(b)]))


def test_forward_matches_oracle():
    for a, b in SEQ_PAIRS:
        x, lx, y, ly = pack(a, b)
        fw, logZ = phmm_forward(x, lx, y, ly)
        fw_ref, z_ref = forward_ref(encode(a), encode(b))
        got = np.asarray(fw)[:, 0, : len(a) + 1, : len(b) + 1]
        finite = fw_ref > -1e29
        np.testing.assert_allclose(got[finite], fw_ref[finite], rtol=1e-4, atol=1e-4)
        assert np.all(got[~finite] < -1e28)
        np.testing.assert_allclose(float(logZ[0]), z_ref, rtol=1e-5)


def test_posterior_matches_oracle():
    for a, b in SEQ_PAIRS:
        x, lx, y, ly = pack(a, b)
        fb, logZ = phmm_posterior(x, lx, y, ly)
        fw_ref, z_ref = forward_ref(encode(a), encode(b))
        bk_ref = backward_ref(encode(a), encode(b))
        fb_ref = np.exp(fw_ref + bk_ref - z_ref)
        got = fb[:, 0, : len(a) + 1, : len(b) + 1]
        np.testing.assert_allclose(got, fb_ref, atol=1e-4)
        # posterior sanity: M posteriors within [0, 1]
        assert got[0].max() <= 1.0 + 1e-5


def test_map_path_and_constraints():
    a, b = "ggcaaagcc", "ggcagcc"
    x, lx, y, ly = pack(a, b)
    fb, _ = phmm_posterior(x, lx, y, ly)
    path = map_path(fb[:, 0], len(a), len(b))
    assert path[-1] == (0, len(a), len(b))
    # path indices monotone
    xs = [p[1] for p in path]
    ys = [p[2] for p in path]
    assert all(x2 >= x1 for x1, x2 in zip(xs, xs[1:]))
    assert all(y2 >= y1 for y1, y2 in zip(ys, ys[1:]))
    c_low, c_high = alignment_constraints(fb[:, 0], len(a), len(b), ali_bound=0.9)
    assert np.all(c_low <= c_high)
    # diagonal band variant
    c_low, c_high = alignment_constraints(fb[:, 0], len(a), len(b), 0.0, band=2)
    assert c_high[0] == 2 and c_low[-1] == len(b) - 2
