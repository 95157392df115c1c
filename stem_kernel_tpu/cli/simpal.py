"""simpal CLI — palindrome-kernel Gram matrices.

Mirrors /root/reference/simpal/simpal.cpp:308-424 (flags seed-length,
min-loop, tolerance, max-distance).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..fold.bpmatrix import fold_sequences
from ..models.simpal import pal_features, simpal_kernel_fn
from .app import add_common_options, parse_args_with_positionals, parse_positional, run_app


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simpal", description="Kernel Matrix Calculator for Palindrome Kernels"
    )
    p.add_argument("-s", "--seed-length", type=int, default=3)
    p.add_argument("-l", "--min-loop", type=int, default=3)
    p.add_argument("--tolerance", type=int, default=1)
    p.add_argument("-m", "--max-distance", type=int, default=300)
    add_common_options(p)
    return p


def main(argv=None) -> int:
    ns = parse_args_with_positionals(build_parser(), argv)
    opts = parse_positional(ns)

    def featurize(alignments):
        seqs = [a.ungapped_rows()[0] for a in alignments]
        bpps = fold_sequences(seqs)
        feats = np.stack(
            [
                pal_features(
                    s, b, seed_length=ns.seed_length,
                    min_loop=ns.min_loop, max_dist=ns.max_distance,
                )
                for s, b in zip(seqs, bpps)
            ]
        )
        return {"pal": feats}, None

    def make_fn(_aux):
        return simpal_kernel_fn(ns.seed_length, ns.tolerance, ns.max_distance)

    run_app(opts, featurize, make_fn, slab_batches=64)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
