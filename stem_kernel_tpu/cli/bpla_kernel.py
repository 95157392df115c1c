"""bpla_kernel CLI — Gram matrices of BPLA (base-pair local-alignment) kernels.

Mirrors /root/reference/bpla_kernel/main.cpp:44-160 (flags --noBP, --SW,
gap/ext/alpha/beta, --score table file).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..fold.bpmatrix import BPMatrixOptions, bpp_for_alignments
from ..io.alphabet import encode
from ..models.bpla import BPLAKernel, DEFAULT_BPLA_SCORE_TABLE
from ..models.featurize import bpla_features
from .app import add_common_options, parse_args_with_positionals, parse_positional, run_app


def read_score_table(path: str) -> np.ndarray:
    """'a b v' lines -> 4x4 table (read_score_table, bpla_kernel/main.cpp:29-42)."""
    table = DEFAULT_BPLA_SCORE_TABLE.copy()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                a, b, v = parts
                table[encode(a.lower())[0], encode(b.lower())[0]] = float(v)
    return table


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bpla_kernel",
        description="Kernel Matrix Calculator for BPLA Kernels",
    )
    k = p.add_argument_group("Kernel Options")
    k.add_argument("--noBP", action="store_true",
                   help="do not use base-pairing profiles (plain LA kernel)")
    k.add_argument("--SW", action="store_true",
                   help="Smith-Waterman kernel instead of local alignment kernel")
    k.add_argument("-g", "--gap", type=float, default=-8.0, help="gap weight")
    k.add_argument("-e", "--ext", type=float, default=-0.75, help="extension weight")
    k.add_argument("-a", "--alpha", type=float, default=4.5, help="alpha")
    k.add_argument("-b", "--beta", type=float, default=0.11, help="beta")
    k.add_argument("--score", default="", help="score table file")
    from .stem_kernel_lite import add_fold_options

    add_fold_options(p)
    add_common_options(p)
    return p


def main(argv=None) -> int:
    ns = parse_args_with_positionals(build_parser(), argv)
    opts = parse_positional(ns)
    score_table = read_score_table(ns.score) if ns.score else None
    kernel = BPLAKernel(
        score_table,
        no_bp=ns.noBP,
        sw=ns.SW,
        gap=ns.gap,
        ext=ns.ext,
        alpha=ns.alpha,
        beta=ns.beta,
    )
    from .stem_kernel_lite import fold_opts_from

    bp_opts = fold_opts_from(ns)

    def featurize(alignments):
        bpps = bpp_for_alignments(alignments, bp_opts)
        return bpla_features(alignments, bpps), None

    # the LA-kernel values overflow float range on long sequences, so the
    # non-SW path evaluates in log space (exact log-space normalization)
    use_log = not ns.SW

    def make_fn(_aux):
        return kernel.log_value if use_log else kernel

    run_app(opts, featurize, make_fn, log_kernel=use_log, slab_batches=64)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
