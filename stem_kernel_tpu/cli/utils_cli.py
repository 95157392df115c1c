"""Evaluation / data-prep command-line tools (reference utils/ equivalents).

One module of small mains mirroring the Ruby/C++ scripts:

  roc                   utils/roc.rb       — AUC + acc/sp/sn from 'label dec' lines
  roc-cv                utils/roc_cv.rb    — per-fold ROC aggregation
  normalize-matrix      utils/normalize_matrix.rb
  normalize-test-matrix utils/normalize_test_matrix.rb
  radial-basis-matrix   utils/radial_basis_matrix.rb
  submatrix             utils/submatrix.rb — row/column subsetting
  dishuffle             utils/dishuffle_fa.rb — dinucleotide-shuffled negatives
  fa-sampling           utils/fa_sampling.rb — FASTA subsampling
  mean-id               utils/mean_id.cpp  — mean pairwise identity
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gram.io import read_precomputed, write_precomputed
from ..io.parsers import parse_fasta
from ..utils.roc import acc_sp_sn, roc_curve_and_auc
from ..utils.shuffle import dinucleotide_shuffle
from ..utils.transforms import normalize_matrix, normalize_test_matrix, rbf_from_gram


def _read_label_dec(stream) -> tuple[np.ndarray, np.ndarray]:
    labels, decs = [], []
    for line in stream:
        parts = line.split()
        if len(parts) >= 2:
            labels.append(int(parts[0]))
            decs.append(float(parts[1]))
    return np.asarray(labels), np.asarray(decs)


def roc_main(argv=None) -> int:
    labels, decs = _read_label_dec(sys.stdin if argv is None else open(argv[0]))
    auc, _ = roc_curve_and_auc(labels, decs)
    acc, sp, sn = acc_sp_sn(labels, decs)
    print(f"acc={acc * 100}, sp={sp * 100}, sn={sn * 100}")
    print(f"ROC score = {auc}")
    return 0


def roc_cv_main(argv=None) -> int:
    """Aggregate '== <fold> <label> <dec>' lines (roc_cv.rb:7-30)."""
    import re

    folds: dict[int, list[tuple[int, float]]] = {}
    stream = sys.stdin if argv is None else open(argv[0])
    for line in stream:
        m = re.match(r"^== (\d+) ([+-]?\d+) ([+-]?[\d.eE+-]+)", line)
        if m:
            folds.setdefault(int(m.group(1)), []).append(
                (int(m.group(2)), float(m.group(3)))
            )
        elif line.startswith("Cross"):
            print(line, end="")
    s = s2 = num = 0.0
    for f in folds.values():
        labels = np.array([x[0] for x in f])
        decs = np.array([x[1] for x in f])
        auc, _ = roc_curve_and_auc(labels, decs)
        s += auc * len(f)
        s2 += auc * auc * len(f)
        num += len(f)
    avg = s / max(num, 1)
    var = max(s2 / max(num, 1) - avg * avg, 0.0)
    print(f"ROC score = {avg}, {np.sqrt(var)}")
    return 0


def normalize_matrix_main(argv) -> int:
    labels, g = read_precomputed(argv[0])
    out = argv[1] if len(argv) > 1 else "/dev/stdout"
    write_precomputed(out, labels, normalize_matrix(g))
    return 0


def normalize_test_matrix_main(argv) -> int:
    """args: train-matrix norm-file test-matrix [out]."""
    _, g = read_precomputed(argv[0])
    train_diag = np.diag(g)
    self_vals = np.array([float(l) for l in open(argv[1])])
    ts_labels, rows = read_precomputed(argv[2])
    out = argv[3] if len(argv) > 3 else "/dev/stdout"
    write_precomputed(out, ts_labels, normalize_test_matrix(rows, self_vals, train_diag))
    return 0


def radial_basis_matrix_main(argv) -> int:
    """args: gamma matrix [out]."""
    gamma = float(argv[0])
    labels, g = read_precomputed(argv[1])
    out = argv[2] if len(argv) > 2 else "/dev/stdout"
    write_precomputed(out, labels, rbf_from_gram(g, gamma))
    return 0


def submatrix_main(argv) -> int:
    """args: n matrix [out] — keep the first n rows/columns (submatrix.rb)."""
    n = int(argv[0])
    labels, g = read_precomputed(argv[1])
    out = argv[2] if len(argv) > 2 else "/dev/stdout"
    write_precomputed(out, labels[:n], g[:n, :n])
    return 0


def dishuffle_main(argv) -> int:
    """args: in.fa [out.fa] [seed] — dinucleotide-shuffled copies."""
    rng = np.random.default_rng(int(argv[2]) if len(argv) > 2 else None)
    recs = parse_fasta(open(argv[0]).read())
    out = open(argv[1], "w") if len(argv) > 1 else sys.stdout
    for name, seq in recs:
        out.write(f">{name}_shuffled\n{dinucleotide_shuffle(seq, rng)}\n")
    return 0


def fa_sampling_main(argv) -> int:
    """args: n in.fa [out.fa] [seed] — sample n records without replacement."""
    n = int(argv[0])
    rng = np.random.default_rng(int(argv[3]) if len(argv) > 3 else None)
    recs = parse_fasta(open(argv[1]).read())
    idx = rng.choice(len(recs), size=min(n, len(recs)), replace=False)
    out = open(argv[2], "w") if len(argv) > 2 else sys.stdout
    for i in sorted(idx):
        name, seq = recs[i]
        out.write(f">{name}\n{seq}\n")
    return 0


def mean_id_main(argv) -> int:
    """Mean pairwise %identity via the match-count DP (mean_id.cpp:9-33)."""
    recs = parse_fasta(open(argv[0]).read())
    seqs = [s for _, s in recs]
    print(f"load {len(seqs)} seqs")

    def dp_match(x: str, y: str) -> int:
        n, m = len(x), len(y)
        prev = np.zeros(m + 1, dtype=np.int64)
        for i in range(1, n + 1):
            cur = np.zeros(m + 1, dtype=np.int64)
            for j in range(1, m + 1):
                d = prev[j - 1] + (1 if x[i - 1] == y[j - 1] else -1)
                cur[j] = max(d, prev[j], cur[j - 1])
            prev = cur
        return int(prev[m])

    total = cnt = 0.0
    for i in range(len(seqs)):
        for j in range(i + 1, len(seqs)):
            ident = dp_match(seqs[i], seqs[j]) / min(len(seqs[i]), len(seqs[j]))
            total += ident
            cnt += 1
    print(f"mean identity: {total / max(cnt, 1)}")
    return 0


_COMMANDS = {
    "roc": roc_main,
    "roc-cv": roc_cv_main,
    "normalize-matrix": normalize_matrix_main,
    "normalize-test-matrix": normalize_test_matrix_main,
    "radial-basis-matrix": radial_basis_matrix_main,
    "submatrix": submatrix_main,
    "dishuffle": dishuffle_main,
    "fa-sampling": fa_sampling_main,
    "mean-id": mean_id_main,
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in _COMMANDS:
        print("commands: " + " ".join(_COMMANDS), file=sys.stderr)
        return 1
    return _COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
