"""Benchmark: kernel throughput on one chip, ONE JSON line.

Headline metric (BASELINE.json north star): stem-DP kernel-pairs/sec/chip —
the DAG closure-matmul stem kernel (/root/reference/stem_kernel_lite/
stem_kernel.cpp:14-95 is the reference's hottest loop).  `vs_baseline`
divides by a MEASURED single-core NumPy evaluation of the same recursion on
the same DAGs (tests/stem_oracle.py) — the reference repo publishes no
numbers of its own (BASELINE.md), so the oracle timing is the baseline.

`extras` carries the two secondary throughputs with their own measured
baselines: the BPLA local-alignment Pallas kernel
(/root/reference/bpla_kernel/bpla_kernel.cpp:64-115) vs a NumPy cell-by-cell
DP (tests/reference_dp.py), and the McCaskill fold engine in seqs/s.

Methodology: the TPU sits behind a tunnel with ~30 ms round-trip latency, so
a single dispatch cannot be timed.  K kernel evaluations are chained INSIDE
one jit — each iteration gathers a rotated set of pairs, so no two
iterations are elidable duplicates — the scalar result is fetched to force
completion, and the best of several runs is divided by K.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

N_SEQS = 32
SEQ_LEN = 100
STEM_BATCH = 256
STEM_CHAIN = 8
BPLA_BATCH = 512
BPLA_LEN = 128
# 64 chained calls: at 20 the ~20 ms axon-tunnel round trip was ~40% of the
# measurement, understating device throughput ~2.3x (872k pairs/s measured
# at chain 64 vs the 377k reported in BENCH_r03)
BPLA_CHAIN = 64
FOLD_BATCH = 128


def _hairpins(rng, n, length):
    comp = {"a": "u", "c": "g", "g": "c", "u": "a"}
    out = []
    for _ in range(n):
        stem = "".join(rng.choice(list("acgu"), size=length // 3))
        rc = "".join(comp[c] for c in reversed(stem))
        mid = "".join(rng.choice(list("acgu"), size=length - 2 * len(stem)))
        out.append(stem + mid + rc)
    return out


def _time_stats(fn, reps=5):
    """(median, min, max) wall time over ``reps`` runs.

    The tunnel's per-dispatch latency varies several-fold run to run
    (BASELINE.md fresh-process table), so a single best-of is not
    distinguishable from noise; the BENCH JSON reports median rates with
    min/max spread (VERDICT r4 #2).
    """
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def _rate_stats(work, fn, reps=5):
    """{median/min/max} of work/time as a rate dict."""
    med, lo, hi = _time_stats(fn, reps)
    return {"median": work / med, "max": work / lo, "min": work / hi}


def _time_best(fn, reps=5):
    return _time_stats(fn, reps)[1]


def bench_stem(seqs):
    """(pairs/s on chip, pairs/s single-core NumPy oracle)."""
    from stem_kernel_tpu.io.profile import Alignment
    from stem_kernel_tpu.models.composite import StemLiteConfig, featurize_stem_examples
    from stem_kernel_tpu.models.stem_kernel import StemKernel, subst_co_table

    cfg = StemLiteConfig(no_string=True)
    alns = [Alignment(rows=[s]) for s in seqs]
    feats, iters = featurize_stem_examples(alns, cfg)
    dev = {k: jnp.asarray(v) for k, v in feats.items()}
    stem = StemKernel(loop_gap=cfg.loop_gap, beta=cfg.beta,
                      len_band=cfg.len_band, precision=cfg.precision)
    stem_exact = StemKernel(loop_gap=cfg.loop_gap, beta=cfg.beta,
                            len_band=cfg.len_band, precision="highest")

    rng = np.random.default_rng(1)
    ix0 = jnp.asarray(rng.integers(0, len(seqs), STEM_BATCH).astype(np.int32))
    iy0 = jnp.asarray(rng.integers(0, len(seqs), STEM_BATCH).astype(np.int32))
    n = len(seqs)

    def make_chained(kern):
        @jax.jit
        def chained(feats, ix0, iy0):
            def body(k, acc):
                # rotate the pair set every iteration: distinct gathers, so
                # XLA cannot collapse the chain into one evaluation
                ix = (ix0 + k) % n
                iy = (iy0 + 2 * k + 1) % n
                x = {kk: jnp.take(v, ix, axis=0) for kk, v in feats.items()}
                y = {kk: jnp.take(v, iy, axis=0) for kk, v in feats.items()}
                return acc + kern(x, y, iters=iters).sum()

            return jax.lax.fori_loop(0, STEM_CHAIN, body, jnp.float32(0))
        return chained

    chained = make_chained(stem)
    float(chained(dev, ix0, iy0))  # compile + warmup
    chip_rate = _rate_stats(STEM_BATCH * STEM_CHAIN,
                            lambda: float(chained(dev, ix0, iy0)))
    chained_x = make_chained(stem_exact)
    float(chained_x(dev, ix0, iy0))
    exact_rate = _rate_stats(STEM_BATCH * STEM_CHAIN,
                             lambda: float(chained_x(dev, ix0, iy0)))
    # closure fixed point: 4 (B,N,N) matmuls per iteration (2 N^3 MACs each)
    n_nodes = int(dev["u"].shape[1])
    stem_flops_pair = iters * 8 * n_nodes**3

    # measured single-core baseline: the same recursion, cell by cell
    from stem_kernel_tpu.fold.bpmatrix import bpp_for_alignment, fold_sequences
    from stem_kernel_tpu.models.dag import build_dag
    from stem_oracle import stem_kernel_ref

    co = subst_co_table(cfg.beta)
    dags = []
    for s in seqs[:3]:
        aln = Alignment(rows=[s])
        bpps = fold_sequences([s])
        dags.append(build_dag(aln, bpp_for_alignment(aln), bpps, th=cfg.th))
    pairs = [(0, 1), (1, 2), (0, 2)]
    t0 = time.perf_counter()
    for a, b in pairs:
        stem_kernel_ref(dags[a], dags[b], co, cfg.loop_gap, len_band=cfg.len_band)
    oracle_rate = len(pairs) / (time.perf_counter() - t0)
    return chip_rate, oracle_rate, stem_flops_pair, exact_rate


def bench_bpla():
    """(pairs/s on chip, pairs/s single-core NumPy oracle, flops/pair).

    Measures the FACTORED low-rank Pallas kernel — the path
    BPLAKernel.__call__ actually ships on TPU (models/bpla.py) — not the
    materialized-score kernel (VERDICT r2 weak #1).  flops/pair comes from
    the kernel's own CostEstimate (ops/pallas_la.py:_factored_call).
    """
    from stem_kernel_tpu.models.bpla import BPLAKernel
    from stem_kernel_tpu.ops.pallas_la import la_exp_factored

    rng = np.random.default_rng(0)
    kern = BPLAKernel()
    # realistic profile-shaped factors: (B, L, 6) = 2 pair + 4 substitution
    prof = rng.dirichlet(np.ones(4), size=(BPLA_BATCH, BPLA_LEN)).astype(np.float32)
    pl_ = rng.uniform(0, 0.7, (BPLA_BATCH, BPLA_LEN)).astype(np.float32)
    pr = rng.uniform(0, 0.7, (BPLA_BATCH, BPLA_LEN)).astype(np.float32)
    pu = np.sqrt(np.clip(1.0 - pl_**2 - pr**2, 0, None))
    d = {"profile": jnp.asarray(prof), "p_left": jnp.asarray(pl_),
         "p_right": jnp.asarray(pr), "p_unpair": jnp.asarray(pu)}
    fx = kern.factors(d, "x")
    fy = kern.factors(d, "y")
    lx = jnp.full((BPLA_BATCH,), BPLA_LEN, jnp.int32)
    alpha, beta, gap, ext = kern.alpha, kern.beta, kern.gap, kern.ext

    @jax.jit
    def chained(fx, fy, lx):
        def body(_, carry):
            fx2, acc = carry
            v = la_exp_factored(fx2, fy, lx, lx, alpha, beta, gap, ext)
            # negligible data dependency so the chain cannot be collapsed
            return fx2 + v.sum() * 0 + 1e-12, acc + v.sum()

        _, acc = jax.lax.fori_loop(0, BPLA_CHAIN, body, (fx, jnp.float32(0)))
        return acc

    float(chained(fx, fy, lx))
    chip_rate = _rate_stats(BPLA_BATCH * BPLA_CHAIN,
                            lambda: float(chained(fx, fy, lx)))
    # per-pair flops, from the kernel's CostEstimate at this shape
    flops_pair = 28 * BPLA_LEN * BPLA_LEN + 2 * BPLA_LEN * BPLA_LEN * BPLA_LEN

    from reference_dp import bpla_exp_ref

    x1 = {k: np.asarray(v[:1]) for k, v in d.items()}
    S = np.asarray(kern.scores(x1, x1)[0], np.float64)
    t0 = time.perf_counter()
    for _ in range(2):
        bpla_exp_ref(S, beta, gap, ext)
    oracle_rate = 2 / (time.perf_counter() - t0)
    return chip_rate, oracle_rate, flops_pair


FS_N = 300
FS_BAND = 16
FS_BATCH = 8
FS_CHAIN = 4


def bench_full_stem():
    """Banded full O(n^4) stem kernel pairs/s at the config-3 regime
    (n=m=300, band=16) — the workload the dense-memory path could not hold
    (VERDICT r2 missing #2; reference stem_kernel/stem_kernel.cpp:165-246).
    Round 4: the VMEM-resident Pallas engine (ops.pallas_full_stem) with
    log-valued scaled states (raw f32 overflows at this regime).
    """
    from stem_kernel_tpu.models.full_stem import pair_weights
    from stem_kernel_tpu.ops.pallas_full_stem import full_stem_banded_pallas_log

    rng = np.random.default_rng(5)
    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    codes = np.zeros((FS_BATCH, FS_N), np.uint8)
    bp = np.zeros((FS_BATCH, FS_N, FS_N), np.float32)
    for b in range(FS_BATCH):
        stem = rng.integers(0, 4, FS_N // 3)
        rc = np.array([comp[int(c)] for c in stem[::-1]], np.uint8)
        mid = rng.integers(0, 4, FS_N - 2 * len(stem))
        c = np.concatenate([stem, mid, rc]).astype(np.uint8)
        codes[b] = c
        bp[b] = pair_weights(c, FS_N)
    lx = jnp.full((FS_BATCH,), FS_N, jnp.int32)
    dx = jnp.asarray(codes)
    dbp = jnp.asarray(bp)

    rolls = [(jnp.roll(dx, k + 1, axis=0), jnp.roll(dbp, k + 1, axis=0))
             for k in range(FS_CHAIN)]

    def run_once():
        vs = [full_stem_banded_pallas_log(dx, yc, lx, lx, dbp, ybp,
                                          0.8, 1.0, 0.5, band=FS_BAND)
              for yc, ybp in rolls]
        return float(sum(v.sum() for v in vs))

    run_once()  # compile + warmup
    return _rate_stats(FS_BATCH * FS_CHAIN, run_once, reps=5)


def bench_fold(seqs):
    """Fold seqs/s through the batched scaled McCaskill engine (incl. the
    device->host BPP fetch, i.e. what the Gram pipeline actually pays)."""
    from stem_kernel_tpu.fold.bpmatrix import fold_sequences

    batch = (seqs * (-(-FOLD_BATCH // len(seqs))))[:FOLD_BATCH]
    fold_sequences(batch)  # compile + warmup
    return _rate_stats(FOLD_BATCH, lambda: fold_sequences(batch), reps=5)


def main() -> None:
    rng = np.random.default_rng(0)
    seqs = _hairpins(rng, N_SEQS, SEQ_LEN)

    stem_rate, stem_base, stem_flops, stem_exact_rate = bench_stem(seqs)
    bpla_rate, bpla_base, bpla_flops = bench_bpla()
    fold_rate = bench_fold(seqs)
    fs_rate = bench_full_stem()

    # achieved FLOP/s from each kernel's own cost model; peak: TPU v5e chip,
    # 197 TF/s bf16 MXU / ~98 TF/s f32 — these kernels run f32 accumulation,
    # so the f32 number is the speed-of-light reference.
    PEAK_F32 = 98e12
    stem_tfs = stem_rate["median"] * stem_flops / 1e12
    bpla_tfs = bpla_rate["median"] * bpla_flops / 1e12

    def r(d):
        return {k: round(v, 1) for k, v in d.items()}

    print(
        json.dumps(
            {
                "metric": "stem_dp_pairs_per_sec",
                "value": round(stem_rate["median"], 1),
                "unit": f"pairs/s (DAG closure kernel, n={SEQ_LEN} seqs, batch {STEM_BATCH}, 1 chip; median of 5, min/max in extras)",
                "vs_baseline": round(stem_rate["median"] / stem_base, 2),
                "extras": {
                    "stem_pairs_per_sec_spread": r(stem_rate),
                    "stem_numpy_oracle_pairs_per_sec": round(stem_base, 2),
                    "stem_achieved_tflops": round(stem_tfs, 2),
                    "stem_exact_f32_pairs_per_sec": round(stem_exact_rate["median"], 1),
                    "stem_pct_of_f32_peak": round(100 * stem_tfs * 1e12 / PEAK_F32, 1),
                    "bpla_factored_pairs_per_sec": round(bpla_rate["median"], 1),
                    "bpla_pairs_per_sec_spread": r(bpla_rate),
                    "bpla_vs_numpy_oracle": round(bpla_rate["median"] / bpla_base, 2),
                    "bpla_numpy_oracle_pairs_per_sec": round(bpla_base, 2),
                    "bpla_achieved_tflops": round(bpla_tfs, 2),
                    "bpla_pct_of_f32_peak": round(100 * bpla_tfs * 1e12 / PEAK_F32, 1),
                    "fold_seqs_per_sec": round(fold_rate["median"], 1),
                    "fold_seqs_per_sec_spread": r(fold_rate),
                    "full_stem_banded_n300_pairs_per_sec": round(fs_rate["median"], 2),
                    "full_stem_spread": r(fs_rate),
                },
            }
        )
    )


def paritycheck() -> None:
    """On-chip Pallas-vs-XLA parity CI (VERDICT r4 #4).

    Runs every Pallas kernel ON THE REAL CHIP against its XLA/scan reference
    path at fixed seeds and asserts tolerances.  The CPU test suite only
    exercises interpret mode (tests/conftest.py forces CPU), so a Mosaic
    codegen regression would pass it; this one command catches that class.
    Prints one JSON line; exits nonzero on any failure.
    """
    results: dict[str, float] = {}
    failures: list[str] = []

    def check(name, err, tol):
        results[name] = float(err)
        if not np.isfinite(err) or err > tol:
            failures.append(f"{name}: err {err:.3g} > tol {tol:g}")

    backend = jax.default_backend()
    rng = np.random.default_rng(42)

    # ---- BPLA LA kernels (ops/pallas_la vs models/bpla scans) ----
    from stem_kernel_tpu.models.bpla import (
        BPLAKernel, local_alignment_exp, local_alignment_log, pair_mask)
    from stem_kernel_tpu.ops.pallas_la import (
        la_exp_factored, la_exp_pallas, la_log_factored, la_log_pallas)

    B, L = 16, 48
    kern = BPLAKernel()
    prof = rng.dirichlet(np.ones(4), size=(B, L)).astype(np.float32)
    pl_ = rng.uniform(0, 0.7, (B, L)).astype(np.float32)
    pr = rng.uniform(0, 0.7, (B, L)).astype(np.float32)
    pu = np.sqrt(np.clip(1.0 - pl_**2 - pr**2, 0, None)).astype(np.float32)
    d = {"profile": jnp.asarray(prof), "p_left": jnp.asarray(pl_),
         "p_right": jnp.asarray(pr), "p_unpair": jnp.asarray(pu)}
    lx = jnp.asarray(rng.integers(8, L + 1, B), jnp.int32)
    ly = jnp.asarray(rng.integers(8, L + 1, B), jnp.int32)
    S = kern.scores(d, d)
    mask = pair_mask(lx, L, ly, L)
    a, b_, g_, e_ = kern.alpha, kern.beta, kern.gap, kern.ext
    v_exp = np.asarray(local_alignment_exp(S, mask, b_, g_, e_), np.float64)
    v_log = np.asarray(local_alignment_log(S, mask, b_, g_, e_), np.float64)
    fx, fy = kern.factors(d, "x"), kern.factors(d, "y")

    got = np.asarray(la_exp_factored(fx, fy, lx, ly, a, b_, g_, e_))
    check("la_exp_factored_rel", np.max(np.abs(got - v_exp) / np.abs(v_exp)), 1e-3)
    got = np.asarray(la_log_factored(fx, fy, lx, ly, a, b_, g_, e_))
    check("la_log_factored_abs", np.max(np.abs(got - v_log)), 3e-3)
    wp, wu = kern.score_parts(d, d)
    got = np.asarray(la_exp_pallas(wp, lx, ly, b_, g_, e_, scores2=wu, alpha=a))
    check("la_exp_slab_rel", np.max(np.abs(got - v_exp) / np.abs(v_exp)), 1e-3)
    got = np.asarray(la_log_pallas(wp, lx, ly, b_, g_, e_, scores2=wu, alpha=a))
    check("la_log_slab_abs", np.max(np.abs(got - v_log)), 3e-3)

    # ---- stem closure fixed point (ops/pallas_stem vs XLA einsum loop) ----
    from stem_kernel_tpu.io.profile import Alignment
    from stem_kernel_tpu.models.composite import (
        StemLiteConfig, featurize_stem_examples)
    from stem_kernel_tpu.models.stem_kernel import (
        stem_kernel_pairs, subst_co_table)

    seqs = _hairpins(rng, 8, 140)  # long enough that the DAG node pad
    cfg = StemLiteConfig(no_string=True)  # crosses the >=96 Pallas routing floor
    feats, iters = featurize_stem_examples(
        [Alignment(rows=[s]) for s in seqs], cfg)
    dev = {k: jnp.asarray(v) for k, v in feats.items()}
    ix = jnp.asarray(rng.integers(0, 8, 32), jnp.int32)
    iy = jnp.asarray(rng.integers(0, 8, 32), jnp.int32)
    x = {k: jnp.take(v, ix, axis=0) for k, v in dev.items()}
    y = {k: jnp.take(v, iy, axis=0) for k, v in dev.items()}
    co = jnp.asarray(subst_co_table(cfg.beta))
    n_nodes = int(dev["u"].shape[1])
    v_pal = np.asarray(stem_kernel_pairs(
        x, y, co, iters=iters, len_band=cfg.len_band, precision="highest"),
        np.float64)
    v_xla = np.asarray(stem_kernel_pairs(
        x, y, co, iters=iters, len_band=cfg.len_band, precision="highest",
        force_xla=True), np.float64)
    denom = np.maximum(np.abs(v_xla), 1e-6)
    check("stem_fixed_point_rel", np.max(np.abs(v_pal - v_xla) / denom), 1e-3)
    if backend in ("tpu", "axon") and n_nodes < 96:
        failures.append(f"stem check not routed to Pallas (n_nodes={n_nodes})")
    results["stem_pallas_routed"] = float(n_nodes >= 96)

    # ---- banded full stem (ops/pallas_full_stem vs XLA wavefront scan) ----
    from stem_kernel_tpu.models.full_stem import (
        full_stem_kernel_banded_log, pair_weights)
    from stem_kernel_tpu.ops.pallas_full_stem import full_stem_banded_pallas_log

    n, band, fb = 96, 8, 4
    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    codes = np.zeros((fb, n), np.uint8)
    bp = np.zeros((fb, n, n), np.float32)
    lens = np.zeros(fb, np.int32)
    for i in range(fb):
        ln = int(rng.integers(n - 12, n + 1))
        stem = rng.integers(0, 4, ln // 3)
        rc = np.array([comp[int(c)] for c in stem[::-1]], np.uint8)
        mid = rng.integers(0, 4, ln - 2 * len(stem))
        c = np.concatenate([stem, mid, rc]).astype(np.uint8)
        codes[i, :ln] = c
        bp[i, :ln, :ln] = pair_weights(c, ln)
        lens[i] = ln
    args = (jnp.asarray(codes), jnp.asarray(np.roll(codes, 1, 0)),
            jnp.asarray(lens), jnp.asarray(np.roll(lens, 1, 0)),
            jnp.asarray(bp), jnp.asarray(np.roll(bp, 1, 0)))
    # tolerance: the Pallas C1 contraction runs one-pass bf16 on the MXU
    # (HIGHEST would cost ~6x MXU passes that cannot hide behind the VPU
    # work); measured on-chip delta ~7e-3 log units, while interpret mode
    # agrees to ~1e-5 — so 2e-2 catches Mosaic codegen breaks without
    # flagging the documented matmul rounding.
    for ab, tag in ((0.0, "fs_banded_abs"), (0.3, "fs_banded_anchored_abs")):
        v_p = np.asarray(full_stem_banded_pallas_log(
            *args, 0.8, 1.0, 0.5, band=band, ali_bound=ab), np.float64)
        v_x = np.asarray(full_stem_kernel_banded_log(
            *args, 0.8, 1.0, 0.5, band=band, ali_bound=ab), np.float64)
        check(tag, np.max(np.abs(v_p - v_x)), 2e-2)

    print(json.dumps({
        "paritycheck": "ok" if not failures else "FAIL",
        "backend": backend,
        "errors": {k: (round(v, 9) if v == v else None)
                   for k, v in results.items()},
        "failures": failures,
    }))
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    if "--paritycheck" in sys.argv:
        paritycheck()
    else:
        main()
