"""la_kernel (lite) CLI — standalone profile string kernel for RNA.

Mirrors /root/reference/stem_kernel_lite/la-main.cpp:89-133 (the 8th
reference binary, built as `la_kernel` from the stem_kernel_lite directory,
Makefile.am:1,9-11): the gap-weighted all-substrings profile string kernel
with RIBOSUM85-60 (default) or match/mismatch substitution, and optional
``--use-bp`` per-position weights from the unpaired-loop profiles of a
folded BPP matrix (la-main.cpp:104-117 constructs the loader with th=0.0 +
folding options; the kernel then weights positions by the loop profile,
string_kernel.cpp:93-110).

The console script is installed as ``la_kernel_lite`` — the reference names
both this binary and the protein BLOSUM62 variant (bpla_kernel/la_main.cpp,
shipped here as ``la_kernel``) plain ``la_kernel`` in different build dirs.

Defaults follow la-main.cpp: alpha=0.2, gap=0.6, match=1.0, mismatch=0.8.
"""

from __future__ import annotations

import argparse

from ..models.string_kernel import StringKernel
from .app import add_common_options, parse_args_with_positionals, parse_positional, run_app
from .stem_kernel_lite import add_fold_options, fold_opts_from


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="la_kernel_lite",
        description="Kernel Matrix Calculator for Stem Kernels "
                    "(profile string kernel)",
    )
    k = p.add_argument_group("Kernel Options")
    k.add_argument("--no-ribosum", action="store_true",
                   help="do not use the RIBOSUM substitution matrix")
    k.add_argument("--use-bp", action="store_true",
                   help="use base-pairing probability weight")
    k.add_argument("-a", "--alpha", type=float, default=0.2,
                   help="weight of the RIBOSUM for the string kernel")
    k.add_argument("-G", "--gap", type=float, default=0.6,
                   help="gap weight for the string kernel")
    k.add_argument("--match", type=float, default=1.0,
                   help="match weight for the string kernel (with --no-ribosum)")
    k.add_argument("--mismatch", type=float, default=0.8,
                   help="mismatch weight for the string kernel (with --no-ribosum)")
    add_fold_options(p)
    add_common_options(p)
    return p


def main(argv=None) -> int:
    ns = parse_args_with_positionals(build_parser(), argv)
    opts = parse_positional(ns)
    bp_opts = fold_opts_from(ns)

    if ns.no_ribosum:
        kern = StringKernel(ns.gap, match=ns.match, mismatch=ns.mismatch)
    else:
        kern = StringKernel(ns.gap, alpha=ns.alpha)

    def featurize(alignments):
        from ..models.featurize import loop_profile_weights, string_kernel_features

        weights = (loop_profile_weights(alignments, bp_opts)
                   if ns.use_bp else None)
        return string_kernel_features(alignments, weights=weights), None

    def make_fn(_aux):
        def kernel_fn(x, y):
            return kern(x["profile"], x["length"], y["profile"], y["length"],
                        wx=x["weight"], wy=y["weight"])

        return kernel_fn

    run_app(opts, featurize, make_fn, slab_batches=64)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
