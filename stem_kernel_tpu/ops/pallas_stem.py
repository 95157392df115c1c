"""Stem-kernel closure fixed point as a VMEM-resident Pallas kernel.

The stem kernel's device form (models/stem_kernel.py) is a fixed point of
four (N, N) matmuls per match-nesting level:

    G0 = Vx @ (M @ Vy^T + L);   M = NS * (Ax @ G0 @ Ay^T)

iterated ``iters`` times, then value = u_x^T M u_y.  Run through XLA, every
iteration re-reads the six per-pair operand matrices from HBM: at the bench
point (B=256, N=128, iters=47) that is ~37 GB of traffic for 24 MB of
distinct inputs, and the loop saturates at roughly half the per-precision
MXU ceiling.  This kernel instead loads each pair's operands into VMEM
ONCE and runs the whole fixed point on-chip:

- grid over batch blocks; per block, six (bb, N, N) operands + two (bb, 1,
  N) root vectors live in VMEM for the kernel's lifetime (bb sized so the
  block fits ~4 MB, leaving room for pipelining);
- the iteration count is DYNAMIC PER PAIR (scalar prefetch): the fixed
  point converges after the pair's own maximum match-nesting depth
  min(depth_x, depth_y) + 1, so shallow pairs skip the no-op iterations the
  XLA path pays for (it must run the corpus-wide maximum);
- matmul precision is selectable: "highest" (full f32 6-pass bf16
  emulation — the default, bit-comparable to the XLA path) or "default"
  (single bf16 pass, ~2.1x faster at ~bf16 relative accuracy).  A manual
  3-pass bf16 middle mode was tried and WEDGES the Mosaic compiler (12
  split dots inside the fori_loop); "high" therefore aliases "highest"
  until Mosaic grows native Precision.HIGH support.

Replaces the hottest loop of the reference
(/root/reference/stem_kernel_lite/stem_kernel.cpp:14-95).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_pairs(n: int) -> int:
    """Pairs per grid block: keep the block's VMEM footprint near ~4 MB
    (6 f32 inputs + 2 f32 scratch).  With Pallas double-buffering the
    inputs, the true peak is ~2x the input share (~5 MB at the cap), which
    leaves headroom under the 16 MB scoped-VMEM budget up to n_pad = 512
    (one pair/block, ~8 MB before buffering); larger n is untested."""
    per_pair = 8 * n * n * 4
    bb = max(1, (4 << 20) // per_pair)
    return 1 << (bb.bit_length() - 1)  # round down to a power of two


def _make_kernel(bb: int, precision: str):
    """Fixed-point kernel body.

    ``precision``: "highest" = native f32 MXU dots (6-pass bf16 emulation,
    bit-comparable to the XLA einsum path); "default" = single bf16 pass
    with f32 accumulation (fastest, ~bf16 input rounding).
    """

    def kernel(it_ref, ns_ref, vx_ref, vyt_ref, ax_ref, ayt_ref, l_ref,
               ux_ref, uy_ref, out_ref, m_ref, g_ref):
        blk = pl.program_id(0)

        def dot_f32(a, b):
            return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

        def dot_bf(a, b):
            return jax.lax.dot(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        dot = dot_bf if precision == "default" else dot_f32

        # trip count: max over the block's pairs (prefetched).  Extra
        # iterations past a pair's own depth are no-ops (the fixed point is
        # stable), and running all pairs in lockstep lets each dot group
        # below be bb INDEPENDENT matmuls — consecutive independent MXU ops
        # pipeline; a per-pair dependent chain stalls the systolic array on
        # every fill/drain.
        niter = it_ref[blk * bb]
        for p in range(1, bb):
            niter = jnp.maximum(niter, it_ref[blk * bb + p])

        for p in range(bb):
            m_ref[p] = jnp.zeros_like(m_ref[p])

        def step(_, carry):
            for p in range(bb):
                g_ref[p] = dot(m_ref[p], vyt_ref[p]) + l_ref[p]
            for p in range(bb):
                g_ref[p] = dot(vx_ref[p], g_ref[p])
            for p in range(bb):
                g_ref[p] = dot(g_ref[p], ayt_ref[p])
            for p in range(bb):
                m_ref[p] = ns_ref[p] * dot(ax_ref[p], g_ref[p])
            return carry

        jax.lax.fori_loop(0, niter, step, 0, unroll=False)

        for p in range(bb):
            w = dot_f32(ux_ref[p], m_ref[p])  # (1, N) row @ (N, N)
            val = jnp.sum(w * uy_ref[p])
            out_ref[0, p : p + 1, 0 : 1] = val[None, None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_iters", "precision", "interpret"))
def stem_fixed_point(
    ns: jax.Array,     # (B, N, N) masked node scores
    vx: jax.Array,     # (B, N, N) x gap closure
    vy: jax.Array,     # (B, N, N) y gap closure (untransposed)
    ax: jax.Array,     # (B, N, N) x match-path operator
    ay: jax.Array,     # (B, N, N) y match-path operator (untransposed)
    l: jax.Array,      # (B, N, N) leaf outer product
    ux: jax.Array,     # (B, N) x root-reach vector
    uy: jax.Array,     # (B, N) y root-reach vector
    iters: jax.Array,  # (B,) int32 per-pair iteration counts
    *,
    max_iters: int,
    precision: str = "highest",
    interpret: bool = False,
) -> jax.Array:
    """u_x^T M u_y after the per-pair closure fixed point.  Returns (B,)."""
    if precision == "high":  # no Mosaic Precision.HIGH; see module docstring
        precision = "highest"
    bsz, n, _ = ns.shape
    n_pad = _round_up(n, LANE)
    bb = _block_pairs(n_pad)
    b_pad = _round_up(bsz, bb)

    def pad_m(a):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, b_pad - bsz), (0, n_pad - n), (0, n_pad - n)))

    def pad_u(a):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, b_pad - bsz), (0, n_pad - n)))[:, None, :]

    mats = [pad_m(ns), pad_m(vx), pad_m(jnp.swapaxes(vy, 1, 2)),
            pad_m(ax), pad_m(jnp.swapaxes(ay, 1, 2)), pad_m(l)]
    uxp, uyp = pad_u(ux), pad_u(uy)
    it = jnp.pad(jnp.minimum(iters, max_iters).astype(jnp.int32),
                 (0, b_pad - bsz))

    mat_spec = pl.BlockSpec((bb, n_pad, n_pad), lambda b, it: (b, 0, 0))
    u_spec = pl.BlockSpec((bb, 1, n_pad), lambda b, it: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // bb,),
        in_specs=[mat_spec] * 6 + [u_spec, u_spec],
        out_specs=pl.BlockSpec((1, bb, LANE), lambda b, it: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bb, n_pad, n_pad), jnp.float32),
            pltpu.VMEM((bb, n_pad, n_pad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(bb, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad // bb, bb, LANE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b_pad * max_iters * n_pad**3,
            bytes_accessed=4 * b_pad * 6 * n_pad * n_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(it, *mats, uxp, uyp)
    return out[:, :, 0].reshape(b_pad)[:bsz]
