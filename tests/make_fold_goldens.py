"""Regenerate tests/golden/fold_bpp.npz — golden BPPs for the shipped model.

Run:  python tests/make_fold_goldens.py

Computes base-pair probability matrices and logZ for realistic structured
ncRNA sequences (tRNA/miRNA/rRNA-like, 60-120 nt) with the f64 log-space
oracle engine under the default (Turner 2004) parameters, and stores them
as the pinned golden outputs.  tests/test_fold_goldens.py asserts both
engines against this file; any change to the shipped energy model or the
DP machinery that shifts BPPs must regenerate the goldens DELIBERATELY.
"""

from __future__ import annotations

import os

import numpy as np

# Realistic structured ncRNA sequences (cloverleafs, hairpin precursors,
# rRNA-like stems).  60-120 nt, the BASELINE.json config range.
GOLDEN_SEQS = {
    # yeast tRNA-Phe (76 nt, the classic cloverleaf)
    "trna_phe": "GCGGAUUUAGCUCAGUUGGGAGAGCGCCAGACUGAAGAUCUGGAGGUCCUGUGUUCGAUCCACAGAAUUCGCACCA",
    # E. coli tRNA-Ala-like (76 nt)
    "trna_ala": "GGGGCUAUAGCUCAGCUGGGAGAGCGCCUGCUUUGCACGCAGGAGGUCUGCGGUUCGAUCCCGCAUAGCUCCACCA",
    # let-7a-1 precursor stem-loop (80 nt)
    "pre_let7a": "UGGGAUGAGGUAGUAGGUUGUAUAGUUUUAGGGUCACACCCACCACUGGGAGAUAACUAUACAAUCUACUGUCUUUCCUA",
    # mir-21 precursor stem-loop (72 nt)
    "pre_mir21": "UGUCGGGUAGCUUAUCAGACUGAUGUUGACUGUUGAAUCUCAUGGCAACACCAGUCGAUGGGCUGUCUGACA",
    # 5S rRNA 5'-domain-like (90 nt)
    "rrna5s_like": "GCCUACGGCCAUACCACCCUGAACGCGCCCGAUCUCGUCUGAUCUCGGAAGCUAAGCAGGGUCGGGCCUGGUUAGUACUUGGAUGGGAGA",
    # hammerhead ribozyme-like (64 nt)
    "hammerhead": "GGGCGACCCUGAUGAGGCCGAAAGGCCGAAACGUUCCCGGUAUCCCGGGUUCGCCGCCGGGCCC",
    # U6 snRNA 5' stem-loop region-like (60 nt)
    "u6_like": "GUGCUCGCUUCGGCAGCACAUAUACUAAAAUUGGAACGAUACAGAGAAGAUUAGCAUGGC",
    # tRNA-Gly-like (71 nt)
    "trna_gly": "GCGGGCAUCGUAUAAUGGCUAUUACCUCAGCCUUCCAAGCUGAUGAUGCGGGUUCGAUUCCCGCUGCCCGCU",
    # synthetic three-way junction (84 nt)
    "junction3": "GGGAAACGGGCUUCGGCCCGAAAGGGCCAAAGGCCUUCGGGCCAAAGGGCGUUCGCGCCCAAACCCGAAAGGGUUCGCCCAAAG",
    # AU-rich weak-structure control (62 nt)
    "au_control": "AUAUUUAAAUAUAUAUUUAAUAUAUAAAUUUAUAUAUUAAAUAUAUAUUUAAAUAUAUAUAA",
}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from stem_kernel_tpu.fold.mccaskill import mccaskill_bpp
    from stem_kernel_tpu.fold.params import default_params
    from stem_kernel_tpu.io.alphabet import encode

    params = default_params()
    out: dict[str, np.ndarray] = {}
    for name, seq in GOLDEN_SEQS.items():
        codes = encode(seq)
        bpp, logz = mccaskill_bpp(codes, params=params, dtype=jnp.float64)
        out[f"{name}__bpp"] = np.asarray(bpp, np.float64)
        out[f"{name}__logz"] = np.asarray(logz, np.float64)
        out[f"{name}__seq"] = np.frombuffer(seq.encode(), np.uint8)
        print(f"{name}: n={len(seq)} logZ={float(logz):.6f} "
              f"max_bpp={float(np.max(bpp)):.4f}")
    path = os.path.join(os.path.dirname(__file__), "golden", "fold_bpp.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
