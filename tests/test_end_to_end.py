"""End-to-end: FASTA -> string kernel Gram -> SVM train/predict -> ROC AUC.

The pipeline of the reference's M0 config ("string_kernel on tRNA seqs"):
families of related sequences vs dinucleotide shuffles must be separable.
"""

import numpy as np

from stem_kernel_tpu.gram.engine import PairKernelEngine
from stem_kernel_tpu.io.parsers import load_examples
from stem_kernel_tpu.io.profile import Alignment
from stem_kernel_tpu.models.featurize import string_kernel_features
from stem_kernel_tpu.models.string_kernel import StringKernel
from stem_kernel_tpu.svm.train import svm_predict_values, svm_train
from stem_kernel_tpu.utils.roc import acc_sp_sn, roc_curve_and_auc
from stem_kernel_tpu.utils.shuffle import dinucleotide_shuffle

rng = np.random.default_rng(42)


def mutate(seq: str, rate: float) -> str:
    out = []
    for c in seq:
        if rng.random() < rate:
            out.append(rng.choice(list("acgu")))
        else:
            out.append(c)
    return "".join(out)


def make_family(n, length=40, rate=0.15):
    ancestor = "".join(rng.choice(list("acgu"), size=length))
    return [mutate(ancestor, rate) for _ in range(n)]


def test_fasta_to_auc(tmp_path):
    pos = make_family(14)
    neg = [dinucleotide_shuffle(s, rng) for s in pos]
    pos_fa = tmp_path / "pos.fa"
    neg_fa = tmp_path / "neg.fa"
    pos_fa.write_text("".join(f">p{i}\n{s}\n" for i, s in enumerate(pos)))
    neg_fa.write_text("".join(f">n{i}\n{s}\n" for i, s in enumerate(neg)))

    ex = load_examples([("+1", str(pos_fa)), ("-1", str(neg_fa))])
    assert len(ex.alignments) == 28

    feats = string_kernel_features(ex.alignments)
    kernel = StringKernel(0.8, alpha=0.2)

    def kfn(x, y):
        return kernel(x["profile"], x["length"], y["profile"], y["length"],
                      x["weight"], y["weight"])

    eng = PairKernelEngine(kfn, feats, batch_size=64)
    g = eng.gram(normalize=True)
    np.testing.assert_allclose(np.diag(g), 1.0, rtol=1e-5)

    # split train/test
    idx = rng.permutation(28)
    train, test = idx[:20], idx[20:]
    labels = ex.labels
    model = svm_train(
        g[np.ix_(train, train)], [labels[i] for i in train], C=1.0
    )
    y_test, dec_test = [], []
    for t in test:
        row = g[t, train]
        _, dec = svm_predict_values(model, row)
        y_test.append(1 if labels[t] == "+1" else -1)
        dec_test.append(dec[0])
    auc, _ = roc_curve_and_auc(np.array(y_test), np.array(dec_test))
    assert auc > 0.8, f"AUC too low: {auc}"


def test_dinucleotide_shuffle_preserves_counts():
    s = "".join(rng.choice(list("acgu"), size=60))
    t = dinucleotide_shuffle(s, rng)
    assert len(t) == len(s)
    assert t[0] == s[0] and t[-1] == s[-1]

    def dinucs(x):
        from collections import Counter

        return Counter(zip(x[:-1], x[1:]))

    assert dinucs(s) == dinucs(t)
