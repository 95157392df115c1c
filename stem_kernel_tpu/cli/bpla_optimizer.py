"""bpla_optimizer CLI — gradient-based BPLA hyperparameter fitting.

Mirrors /root/reference/bpla_kernel/bpla_optimizer.cpp:317-452: optimize
(C, alpha, beta, gap, ext) by L-BFGS-B over a smoothed-AUC CV objective,
with the kernel matrix and its analytic parameter gradients recomputed each
step — here as one batched device pass (kernel + AD gradients) over the
upper triangle, replacing the reference's per-pair compute_gradients loop
and MPI Bcast merge (bpla_optimizer.cpp:59-122).

Bounds (bpla_optimizer.cpp:419-426): alpha >= 1e-3; beta in [1e-3, 0.3];
gap, ext <= 0; C >= 1e-5.
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from ..fold.bpmatrix import BPMatrixOptions, bpp_for_alignments
from ..models.bpla import bpla_kernel_batch, bpla_score_parts, pair_mask
from ..models.featurize import bpla_features
from ..opt.lbfgsb import BOTH_BOUNDS, LOWER_BOUND, UPPER_BOUND
from ..opt.optimizer import optimize_kernel_params
from .app import load_labeled, parse_args_with_positionals
from .bpla_kernel import read_score_table
from ..models.bpla import DEFAULT_BPLA_SCORE_TABLE


def bpla_matrix_with_grads(
    feats: dict[str, np.ndarray],
    score_table: np.ndarray,
    params: np.ndarray,
    *,
    batch_size: int = 256,
    normalize: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """(K, dK/dparams) over all examples, computed in device batches.

    params = (alpha, beta, gap, ext); the score decomposition
    s = alpha*w_pair + w_unpair is parameter-independent apart from alpha, so
    w_pair/w_unpair are built per pair batch and kernel+gradients come from
    one forward+backward pass (models.bpla.bpla_kernel_batch).
    """
    n = feats["profile"].shape[0]
    iu = np.triu_indices(n)
    ix, iy = iu[0].astype(np.int32), iu[1].astype(np.int32)
    st = jnp.asarray(score_table)
    pj = jnp.asarray(params, jnp.float32)
    dev = {k: jnp.asarray(v) for k, v in feats.items()}

    K = np.zeros((n, n))
    G = np.zeros((4, n, n))
    for start in range(0, len(ix), batch_size):
        bx = ix[start : start + batch_size]
        by = iy[start : start + batch_size]
        x = {k: v[bx] for k, v in dev.items()}
        y = {k: v[by] for k, v in dev.items()}
        w_pair, w_unpair = bpla_score_parts(
            x["profile"], x["p_left"], x["p_right"], x["p_unpair"],
            y["profile"], y["p_left"], y["p_right"], y["p_unpair"], st,
        )
        mask = pair_mask(x["length"], w_pair.shape[1], y["length"], w_pair.shape[2])
        vals, grads = bpla_kernel_batch(w_pair, w_unpair, mask, pj, with_grads=True)
        vals = np.asarray(vals, np.float64)
        grads = np.asarray(grads, np.float64)
        K[bx, by] = vals
        K[by, bx] = vals
        for p in range(4):
            G[p, bx, by] = grads[:, p]
            G[p, by, bx] = grads[:, p]

    if normalize:
        d = np.clip(np.diag(K), 1e-300, None)
        sq = np.sqrt(np.outer(d, d))
        Kn = K / sq
        Gn = np.empty_like(G)
        for p in range(4):
            gd = np.diag(G[p])
            Gn[p] = (G[p] - 0.5 * K * (gd[:, None] / d[:, None] + gd[None, :] / d[None, :])) / sq
        return Kn, Gn
    return K, G


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bpla_optimizer",
        description="Hyperparameter optimizer for BPLA kernels",
    )
    p.add_argument("-g", "--gap", type=float, default=-8.0)
    p.add_argument("-e", "--ext", type=float, default=-0.75)
    p.add_argument("-a", "--alpha", type=float, default=4.5)
    p.add_argument("-b", "--beta", type=float, default=0.11)
    p.add_argument("-C", type=float, default=1.0, dest="C")
    p.add_argument("--fold", type=int, default=5, help="CV folds")
    p.add_argument("--score", default="", help="score table file")
    p.add_argument("-n", "--normalize", action="store_true")
    p.add_argument("--use-alifold", action="store_true")
    return p


def main(argv=None) -> int:
    ns = parse_args_with_positionals(build_parser(), argv)
    # positionals: label1 file1 [label2 file2 ...]  (no output file)
    rest = ns.args
    labels_files = list(zip(rest[0::2], rest[1::2]))
    alns, labels = load_labeled([l for l, _ in labels_files], [f for _, f in labels_files])
    y = np.array([1.0 if l in ("+1", "1") else -1.0 for l in labels])

    score_table = read_score_table(ns.score) if ns.score else DEFAULT_BPLA_SCORE_TABLE
    bpps = bpp_for_alignments(alns, BPMatrixOptions(alifold=ns.use_alifold))
    feats = bpla_features(alns, bpps)

    def kernel_fn(params):
        return bpla_matrix_with_grads(
            feats, score_table, params, normalize=ns.normalize
        )

    params, C, f = optimize_kernel_params(
        y, kernel_fn,
        np.array([ns.alpha, ns.beta, ns.gap, ns.ext]), ns.C,
        lower=np.array([1e-3, 1e-3, -1e30, -1e30]),
        upper=np.array([1e30, 0.3, 0.0, 0.0]),
        bound_types=np.array([LOWER_BOUND, BOTH_BOUNDS, UPPER_BOUND, UPPER_BOUND]),
        ncv=ns.fold, verbose=True,
    )
    print(
        f"Optimized Parameters:\n  C={C:g}, alpha={params[0]:g}, "
        f"beta={params[1]:g}, gap={params[2]:g}, ext={params[3]:g}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
