"""CONTRAfold CLLM: engine mapping, enumeration, training, loader, CLI.

The model has two independent implementations that must agree:
- fast inference = contrafold_energy_params -> the LUT McCaskill engines
  (already oracle-exact vs exhaustive enumeration, tests/test_fold.py);
- training = cf_logZ / cf_structure_score written directly on the weight
  arrays (differentiable).
Pinning them equal for random weights validates the whole feature mapping
(the reference's CONTRAFOLD method delegates to libcontrafold,
/root/reference/common/bpmatrix.cpp:264-283 — here the CLLM is native).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stem_kernel_tpu.fold.contrafold import (
    SCHEMA,
    cf_logZ,
    cf_structure_score,
    contrafold_bpp,
    contrafold_energy_params,
    default_weights,
    is_contrafold_params,
    load_contrafold_params,
    parse_dotbracket,
    save_contrafold_params,
    train_contrafold,
    vector_to_weights,
    weights_to_vector,
    zero_weights,
    _wj,
)
from stem_kernel_tpu.fold.mccaskill import mccaskill_bpp, mccaskill_logZ
from stem_kernel_tpu.io.alphabet import encode

from full_fold_oracle import brute_force_Z_bpp, enumerate_structures


def _random_weights(seed: int, scale: float = 0.4) -> dict:
    rng = np.random.default_rng(seed)
    w = default_weights()
    for name, shape in SCHEMA:
        w[name] = np.asarray(w[name]) + rng.uniform(-scale, scale, shape)
    return w


SEQS = ["gggaaaccc", "gcaucgaaagcgaugc", "ggcgaaagccauaaggg",
        "guggaaaccauccaaagggcau"]


@pytest.mark.parametrize("seed", [0, 1])
def test_trainer_inside_equals_engine_under_mapping(seed):
    """cf_logZ (differentiable trainer path) == engine logZ (fast inference
    path) under contrafold_energy_params, for fully randomized weights —
    machine precision.  This pins every feature of the mapping."""
    w = _random_weights(seed)
    p = contrafold_energy_params(w)
    wj = _wj(w)
    for seq in SEQS:
        codes = encode(seq)
        z_eng = mccaskill_logZ(codes, params=p, dtype=jnp.float64)
        z_cf = float(cf_logZ(wj, codes))
        np.testing.assert_allclose(z_cf, z_eng, rtol=1e-12)


def test_structure_scores_sum_to_partition_function():
    """sum over ALL structures of exp(cf_structure_score) == exp(cf_logZ):
    the score decomposition and the inside recursion are the same model."""
    from scipy.special import logsumexp

    w = _random_weights(2)
    p = contrafold_energy_params(w)
    wj = _wj(w)
    for seq in ["gggaaaccc", "gcaucgaaagcgaugc"]:
        codes = encode(seq)
        structs = enumerate_structures(codes, p)
        scores = [float(cf_structure_score(wj, codes, st)) for st in structs]
        np.testing.assert_allclose(
            logsumexp(scores), float(cf_logZ(wj, codes)), rtol=1e-12)


def test_engine_bpp_matches_enumeration_under_mapping():
    """BPPs from the fast engine under mapped CONTRAfold weights equal the
    brute-force posterior (the end product the reference takes from
    libcontrafold's ComputePosterior)."""
    w = _random_weights(3)
    p = contrafold_energy_params(w)
    codes = encode("gcaucgaaagcgaugc")
    want_z, want_b = brute_force_Z_bpp(codes, p)
    got_b, got_z = mccaskill_bpp(codes, params=p, dtype=jnp.float64)
    np.testing.assert_allclose(got_z, want_z, rtol=1e-10)
    np.testing.assert_allclose(got_b, want_b, atol=1e-12)


def test_gradient_matches_finite_difference():
    w = _random_weights(4)
    vec = weights_to_vector(w)
    codes = encode("gggcaaaagccc")

    def f(v):
        return cf_logZ(vector_to_weights(v), codes)

    g = jax.grad(f)(jnp.asarray(vec))
    rng = np.random.default_rng(0)
    for idx in rng.choice(len(vec), size=5, replace=False):
        eps = 1e-6
        vp, vm = vec.copy(), vec.copy()
        vp[idx] += eps
        vm[idx] -= eps
        fd = (float(f(jnp.asarray(vp))) - float(f(jnp.asarray(vm)))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-5, atol=1e-8)


def test_training_improves_conditional_likelihood():
    examples = [
        ("gggcaaaagccc", "((((....))))"),
        ("gcgcuuaagcgc", "((((....))))"),
    ]
    w, hist = train_contrafold(examples, steps=25, lr=0.05)
    assert hist[-1] < hist[0]
    # the trained model concentrates posterior on the training helix
    bpp = contrafold_bpp(["gggcaaaagccc"], w)[0]
    assert bpp[0, 11] > 0.5 and bpp[3, 8] > 0.5


def test_params_file_roundtrip_and_sniffing(tmp_path):
    w = _random_weights(5)
    path = tmp_path / "cf.params"
    save_contrafold_params(str(path), w)
    assert is_contrafold_params(str(path))
    w2 = load_contrafold_params(str(path))
    np.testing.assert_allclose(
        weights_to_vector(w2), weights_to_vector(w), atol=1e-8)
    # at_least (cumulative) spelling reproduces CONTRAfold's length encoding
    p2 = tmp_path / "cum.params"
    p2.write_text(
        "hairpin_length_at_least_3 -1.5\n"
        "hairpin_length_at_least_5 -0.25\n"
        "base_pair_GC 2.0\n"
    )
    wc = load_contrafold_params(str(p2))
    assert wc["hairpin_length"][3] == -1.5
    assert wc["hairpin_length"][4] == -1.5
    assert wc["hairpin_length"][10] == pytest.approx(-1.75)
    assert wc["base_pair"][1] == 2.0


def test_default_weights_give_sensible_posteriors():
    bpp = contrafold_bpp(["gggcaaaagccc"])[0]
    assert bpp[0, 11] + bpp[1, 10] > 0.5  # the designed helix dominates


def test_cli_use_contrafold(tmp_path):
    from stem_kernel_tpu.cli.stem_kernel_lite import main

    pos = tmp_path / "pos.fa"
    neg = tmp_path / "neg.fa"
    pos.write_text(">a\ngggcaaaagccc\n>b\ngcgcuuaagcgc\n")
    neg.write_text(">c\nacacacacacac\n>d\nagagagagagag\n")
    # shipped default weights
    rc = main(["--use-contrafold", "default", "-n",
               str(tmp_path / "km1.dat"), "+1", str(pos), "-1", str(neg)])
    assert rc == 0
    # a weight file (auto-detected CONTRAfold format via load_params_file)
    wpath = tmp_path / "w.params"
    save_contrafold_params(str(wpath), default_weights())
    rc = main(["--use-contrafold", str(wpath), "-n",
               str(tmp_path / "km2.dat"), "+1", str(pos), "-1", str(neg)])
    assert rc == 0
    m1 = (tmp_path / "km1.dat").read_text()
    m2 = (tmp_path / "km2.dat").read_text()
    assert m1.splitlines()[0].split()[0] == "+1"
    assert m1 == m2  # same weights through both entry points


def test_dotbracket_parser():
    assert parse_dotbracket("((..))") == ((0, 5), (1, 4))
    with pytest.raises(ValueError):
        parse_dotbracket("((.)")


def test_non_canonical_feature_rejected_with_location(tmp_path):
    """Full CONTRAfold v2.02 files carry non-complementary tokens (e.g.
    base_pair_AA); the loader must reject them with file:line context, not
    a bare IndexError (ADVICE r3 #1)."""
    import pytest

    from stem_kernel_tpu.fold.contrafold import load_contrafold_params

    p = tmp_path / "w.params"
    p.write_text("base_pair_AU 1.5\nbase_pair_AA 0.25\n")
    with pytest.raises(ValueError, match=r"w.params:2.*base_pair_AA"):
        load_contrafold_params(str(p))
