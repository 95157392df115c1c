"""Benchmark: BPLA kernel-pairs/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is the reference's hottest loop — per-pair local-alignment DP
over a Gram tile (/root/reference/bpla_kernel/bpla_kernel.cpp:64-115 inside
the pair loop of common/kernel_matrix.cpp:44-56).

Methodology: the TPU here sits behind a tunnel with ~30 ms round-trip
latency and an async dispatch whose block_until_ready returns early, so a
single dispatch cannot be timed.  K tile evaluations are chained INSIDE one
jit (data dependency between iterations prevents elision), the scalar result
is fetched to host to force completion, and the best of several runs is
divided by K.

Baseline: the reference's C++ DP updates ~5 states/cell serially; at ~50M
cells/s on one modern core that is ~3000 pairs/s for this 128x128 geometry.
vs_baseline = measured pairs/s / 3000 (the repo publishes no numbers of its
own — see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 512
LEN = 128
CHAIN = 20
BASELINE_PAIRS_PER_SEC = 3000.0


def main() -> None:
    from stem_kernel_tpu.ops.pallas_la import la_exp_affine_auto

    rng = np.random.default_rng(0)
    w_pair = jnp.asarray(rng.uniform(0, 1, (BATCH, LEN, LEN)).astype(np.float32))
    w_unpair = jnp.asarray(rng.uniform(-2, 2, (BATCH, LEN, LEN)).astype(np.float32))
    lx = jnp.full((BATCH,), LEN, jnp.int32)
    ly = jnp.full((BATCH,), LEN, jnp.int32)
    alpha, beta, gap, ext = 4.5, 0.11, -8.0, -0.75

    def chained(a, b, lx, ly):
        def body(_, carry):
            a2, acc = carry
            # the alpha*w_pair + w_unpair affine is fused inside the Pallas
            # kernel — the combined score tensor never touches HBM
            v = la_exp_affine_auto(a2, b, lx, ly, alpha, beta, gap, ext)
            # feed a (numerically negligible) function of the output back into
            # the next iteration so XLA cannot elide repeated tiles
            return a2 + v.sum() * 0 + 1e-12, acc + v.sum()

        _, acc = jax.lax.fori_loop(0, CHAIN, body, (a, jnp.float32(0)))
        return acc

    f = jax.jit(chained)
    float(f(w_pair, w_unpair, lx, ly))  # compile + warmup

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(w_pair, w_unpair, lx, ly))  # host fetch forces completion
        best = min(best, time.perf_counter() - t0)

    pairs_per_sec = BATCH * CHAIN / best
    print(
        json.dumps(
            {
                "metric": "bpla_kernel_pairs_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": f"pairs/s ({LEN}x{LEN} cells, batch {BATCH}, 1 chip)",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
