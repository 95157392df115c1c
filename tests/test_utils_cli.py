"""Utility CLI tools round-trip tests."""

import numpy as np

from stem_kernel_tpu.cli import utils_cli
from stem_kernel_tpu.gram.io import read_precomputed, write_precomputed

rng = np.random.default_rng(31)


def make_matrix(tmp_path, n=5):
    g = rng.uniform(0.5, 2.0, (n, n))
    g = (g + g.T) / 2 + n * np.eye(n)
    labels = ["+1"] * (n // 2) + ["-1"] * (n - n // 2)
    path = str(tmp_path / "m.dat")
    write_precomputed(path, labels, g)
    return path, labels, g


def test_normalize_matrix(tmp_path):
    path, labels, g = make_matrix(tmp_path)
    out = str(tmp_path / "norm.dat")
    assert utils_cli.main(["normalize-matrix", path, out]) == 0
    _, gn = read_precomputed(out)
    np.testing.assert_allclose(np.diag(gn), 1.0, rtol=1e-9)
    d = np.sqrt(np.diag(g))
    np.testing.assert_allclose(gn, g / np.outer(d, d), rtol=1e-9)


def test_radial_basis_matrix(tmp_path):
    path, labels, g = make_matrix(tmp_path)
    out = str(tmp_path / "rbf.dat")
    assert utils_cli.main(["radial-basis-matrix", "0.1", path, out]) == 0
    _, gr = read_precomputed(out)
    d = np.diag(g)
    want = np.exp(-0.1 * (d[:, None] + d[None, :] - 2 * g))
    np.testing.assert_allclose(gr, want, rtol=1e-9)


def test_submatrix(tmp_path):
    path, labels, g = make_matrix(tmp_path)
    out = str(tmp_path / "sub.dat")
    assert utils_cli.main(["submatrix", "3", path, out]) == 0
    l2, g2 = read_precomputed(out)
    assert len(l2) == 3 and g2.shape == (3, 3)
    np.testing.assert_allclose(g2, g[:3, :3], rtol=1e-9)


def test_normalize_test_matrix(tmp_path):
    path, labels, g = make_matrix(tmp_path)
    rows = rng.uniform(0.1, 1.0, (2, 5))
    selfv = np.array([2.0, 3.0])
    ts_path = str(tmp_path / "ts.dat")
    write_precomputed(ts_path, ["+1", "-1"], rows)
    norm_path = str(tmp_path / "norm.txt")
    with open(norm_path, "w") as f:
        f.write("".join(f"{v}\n" for v in selfv))
    out = str(tmp_path / "tsn.dat")
    assert utils_cli.main(["normalize-test-matrix", path, norm_path, ts_path, out]) == 0
    _, got = read_precomputed(out)
    want = rows / (np.sqrt(selfv)[:, None] * np.sqrt(np.diag(g))[None, :])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_roc_and_dishuffle_and_sampling(tmp_path):
    dec_file = tmp_path / "dec.txt"
    dec_file.write_text("1 2.0\n1 1.5\n-1 -0.5\n-1 0.1\n")
    assert utils_cli.main(["roc", str(dec_file)]) == 0

    fa = tmp_path / "in.fa"
    fa.write_text(">a\nacguacguacgugcaugc\n>b\nggggccccaaaauuuu\n")
    out_fa = tmp_path / "shuf.fa"
    assert utils_cli.main(["dishuffle", str(fa), str(out_fa), "7"]) == 0
    recs = out_fa.read_text()
    assert recs.count(">") == 2

    samp = tmp_path / "samp.fa"
    assert utils_cli.main(["fa-sampling", "1", str(fa), str(samp), "3"]) == 0
    assert samp.read_text().count(">") == 1

    assert utils_cli.main(["mean-id", str(fa)]) == 0


def test_roc_cv(tmp_path):
    f = tmp_path / "cv.txt"
    f.write_text(
        "== 0 1 1.2\n== 0 -1 -0.3\n== 1 1 0.8\n== 1 -1 0.9\nCross validation done\n"
    )
    assert utils_cli.main(["roc-cv", str(f)]) == 0


def test_svm_train_predict_cli(tmp_path):
    from stem_kernel_tpu.cli.svm_tools import predict_main, train_main

    r = np.random.default_rng(5)
    n = 20
    X = r.normal(size=(n, 3))
    X[: n // 2] += 1.5
    K = X @ X.T
    labels = ["+1"] * (n // 2) + ["-1"] * (n - n // 2)
    mat = str(tmp_path / "km.dat")
    write_precomputed(mat, labels, K)
    model = str(tmp_path / "m.model")
    assert train_main(["-c", "10", mat, model]) == 0
    out = str(tmp_path / "pred.txt")
    assert predict_main([mat, model, out]) == 0
    preds = [l.split()[0] for l in open(out)]
    acc = np.mean([p == l for p, l in zip(preds, labels)])
    assert acc > 0.8
    # CV mode
    assert train_main(["-v", "4", mat]) == 0


def test_stage_timer_and_memory_probe():
    from stem_kernel_tpu.utils.tracing import StageTimer, dag_memory_probe
    from stem_kernel_tpu.models.dag import build_dag
    from stem_kernel_tpu.fold.bpmatrix import fold_sequences, bpp_for_alignment
    from stem_kernel_tpu.io.profile import Alignment

    t = StageTimer()
    with t.stage("fold", items=1):
        seq = "gggcgcaagcuugaaagcgccc"
        bpps = fold_sequences([seq])
        aln = Alignment(rows=[seq])
        avg = bpp_for_alignment(aln)
    with t.stage("dag", items=1):
        dag = build_dag(aln, avg, bpps)
    assert t.totals["fold"] > 0
    probe = dag_memory_probe([dag])
    assert probe["total_bytes"] > 0 and probe["max_live_nodes"] >= 1


def test_dinucleotide_shuffle_indices_permutation():
    from stem_kernel_tpu.utils.shuffle import dinucleotide_shuffle_indices

    rng = np.random.default_rng(5)
    toks = list("ACGUACGUUGCAACGGUU")
    out, idx = dinucleotide_shuffle_indices(toks, rng)
    assert sorted(idx) == list(range(len(toks)))
    assert [toks[i] for i in idx] == out
    # dinucleotide counts preserved
    def counts(s):
        d = {}
        for a, b in zip(s[:-1], s[1:]):
            d[(a, b)] = d.get((a, b), 0) + 1
        return d
    assert counts(out) == counts(toks)


def test_roc_p_main(tmp_path, capsys):
    from stem_kernel_tpu.cli.utils_cli import roc_p_main

    ans = tmp_path / "ans.txt"
    ans.write_text("1\n1\n-1\n-1\n")
    pred = tmp_path / "pred.txt"
    pred.write_text(
        "labels 1 -1\n"
        "1 0.9 0.1\n"
        "1 0.8 0.2\n"
        "-1 0.3 0.7\n"
        "1 0.6 0.4\n"  # wrong prediction of a negative
    )
    assert roc_p_main([str(ans), str(pred)]) == 0
    out = capsys.readouterr().out
    assert "acc=75.0" in out
    assert "ROC score = 1.0" in out  # probs perfectly rank pos above neg


def test_submatrix_test_main(tmp_path):
    from stem_kernel_tpu.cli.utils_cli import submatrix_test_main
    from stem_kernel_tpu.gram.io import read_precomputed, write_precomputed

    g = np.arange(12, dtype=np.float64).reshape(3, 4)
    src = str(tmp_path / "in.dat")
    write_precomputed(src, ["+1", "-1", "+1"], g)
    dst = str(tmp_path / "out.dat")
    assert submatrix_test_main(["2", src, dst]) == 0
    labels, g2 = read_precomputed(dst)
    assert g2.shape == (3, 2)
    np.testing.assert_allclose(g2, g[:, :2])


def test_p_norm_inverts_norm_tail():
    from stem_kernel_tpu.cli.utils_cli import _norm_tail, p_norm

    for y in (-0.45, -0.2, 0.0, 0.1, 0.3, 0.49):
        assert abs(_norm_tail(p_norm(y)) - y) < 1e-9


def test_dishuffle_aln_main(tmp_path):
    from stem_kernel_tpu.cli.utils_cli import dishuffle_aln_main
    from stem_kernel_tpu.io.parsers import parse_clustal

    aln_text = (
        "CLUSTAL W (1.83) multiple sequence alignment\n\n"
        "s1  ACGUACGUACGUACGU\n"
        "s2  ACGU-CGUACGAACGU\n"
        "s3  ACGUACGUACGCACG-\n"
    )
    src = tmp_path / "in.aln"
    src.write_text(aln_text)
    dst = tmp_path / "out.aln"
    assert dishuffle_aln_main([str(src), str(dst), "11"]) == 0
    shuffled = parse_clustal(dst.read_text())[0]
    orig = parse_clustal(aln_text)[0]
    assert [n for n, _ in shuffled] == [n for n, _ in orig]
    # same multiset of columns
    ocols = sorted(zip(*[s for _, s in orig]))
    scols = sorted(zip(*[s for _, s in shuffled]))
    assert ocols == scols


def test_dishuffle_fa_pos_main(tmp_path):
    from stem_kernel_tpu.cli.utils_cli import dishuffle_fa_pos_main
    from stem_kernel_tpu.io.parsers import parse_fasta

    seq = "ACGUACGGUUCAACGGAUUACGAUCCGAUGCAU"
    src = tmp_path / "in.fa"
    src.write_text(f">x\n{seq}\n")
    dst = tmp_path / "out.fa"
    assert dishuffle_fa_pos_main([str(src), str(dst), "3"]) == 0
    (name, emb), = parse_fasta(dst.read_text())
    assert seq in emb
    assert len(emb) >= len(seq)
    assert "orig 33" in name
