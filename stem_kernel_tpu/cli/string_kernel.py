"""string_kernel CLI — plain gap-weighted all-substrings kernel.

Mirrors /root/reference/string_kernel/main.cpp:22-118 (single flag -g/--gap,
default 1.0; raw FASTA sequences).
"""

from __future__ import annotations

import argparse

from ..models.featurize import plain_string_features
from ..models.string_kernel import plain_string_kernel
from .app import add_common_options, parse_args_with_positionals, parse_positional, run_app


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="string_kernel",
        description="Kernel Matrix Calculator for String Kernels",
    )
    p.add_argument("-g", "--gap", type=float, default=1.0, help="gap weight")
    add_common_options(p)
    return p


def main(argv=None) -> int:
    ns = parse_args_with_positionals(build_parser(), argv)
    opts = parse_positional(ns)
    gap = ns.gap

    def featurize(alignments):
        seqs = [a.ungapped_rows()[0] for a in alignments]
        return plain_string_features(seqs), None

    def make_fn(_aux):
        def kernel_fn(x, y):
            return plain_string_kernel(x["codes"], x["length"], y["codes"], y["length"], gap)

        return kernel_fn

    run_app(opts, featurize, make_fn, slab_batches=64)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
