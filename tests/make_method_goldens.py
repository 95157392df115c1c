"""Regenerate tests/golden/method_bpp.npz — pinned ALIFOLD/SFOLD/CONTRAfold
outputs (VERDICT r3 next-round #8: the secondary fold methods were only
self-consistency-tested; drift in covariance scoring, the sampler, or the
CONTRAfold feature mapping would pass silently).

Run:  python tests/make_method_goldens.py

- alifold: true-alifold (per-row energy averaging + covariance) BPPs for
  three alignments, computed in f64;
- sfold: seeded stochastic-traceback BPPs (seed 0, 200 samples) — exact
  integers / n_samples, pinned bit-exactly;
- contrafold: posteriors under the shipped thermodynamically-seeded default
  weights, f64.
"""

from __future__ import annotations

import os

import numpy as np

ALIFOLD_ALNS = {
    "trna_pair": [
        "GCGGAUUUAGCUCAGUUGGGAGAGCGCCAGACUGAAGAUCUGGAGGUCCUGUGUUCGAUCCACAGAAUUCGCACCA",
        "GCGGACUUAGCUCAGUUGGGAGAGCGCCAGACUGAAAAUCUGGAGGUCCUGUGUUCGAUCCACAGAGUUCGCACCA",
        "GCGGAUUUAGCUCAGUCGGGAGAGCACCAGACUGAAGAUCUGGAGGUCCUGGGUUCGAUCCCCAGAAUUCGCACCA",
    ],
    "hairpin_gapped": [
        "gggcgcaagcuugaaagcgccc",
        "ggg-gcaagcuugaaagcg-cc",
        "gagcgcaagcucgaaagcgccc",
    ],
    "stem_compensatory": [
        "ggggaaaauuccccgcaaagc",
        "gaggaaaauuccucgcaaagc",
        "gcggaaaauuccgcgcaaagc",
    ],
}

SFOLD_SEQS = {
    "hairpin": "gggcgcaagcuugaaagcgccc",
    "trna_start": "GCGGAUUUAGCUCAGUUGGGAGAGCGCCAGACUGAAGAUCUGG",
}
SFOLD_SAMPLES = 200

CONTRA_SEQS = {
    "hairpin": "gggcgcaagcuugaaagcgccc",
    "bistable": "ggcacgaaagugccaaaggcacgaaagugcc",
}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from stem_kernel_tpu.fold.bpmatrix import alifold_bpp
    from stem_kernel_tpu.fold.contrafold import contrafold_bpp
    from stem_kernel_tpu.fold.sampling import sfold_bpp
    from stem_kernel_tpu.io.profile import Alignment

    out: dict[str, np.ndarray] = {}
    for name, rows in ALIFOLD_ALNS.items():
        out[f"ali_{name}__rows"] = np.frombuffer(
            "\n".join(rows).encode(), dtype=np.uint8
        )
        out[f"ali_{name}__bpp"] = alifold_bpp(Alignment(rows=rows))
    for name, seq in SFOLD_SEQS.items():
        out[f"sfold_{name}__seq"] = np.frombuffer(seq.encode(), dtype=np.uint8)
        out[f"sfold_{name}__bpp"] = sfold_bpp(seq, SFOLD_SAMPLES, seed=0)
    for name, seq in CONTRA_SEQS.items():
        out[f"contra_{name}__seq"] = np.frombuffer(seq.encode(), dtype=np.uint8)
        out[f"contra_{name}__bpp"] = contrafold_bpp([seq])[0]

    path = os.path.join(os.path.dirname(__file__), "golden", "method_bpp.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
