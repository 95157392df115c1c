"""Pallas TPU kernel for the 5-state local-alignment (BPLA/LA) DP.

This is the fused-VMEM version of
:func:`stem_kernel_tpu.models.bpla.local_alignment_exp` — the hottest loop of
the reference (/root/reference/bpla_kernel/bpla_kernel.cpp:64-115 inside the
pair loop of /root/reference/common/kernel_matrix.cpp:44-56).

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):

- The score tensor is streamed in row-major ``(Lx, B, Ly)`` layout so each
  grid step DMAs one tile-aligned ``(BB, Ly)`` row slab from HBM into VMEM
  while the previous slab computes (Pallas double-buffers grid inputs).
- The M/X/Y state rows persist in VMEM scratch across the inner row loop;
  nothing round-trips to HBM except the score reads and the final (B,)
  values, so the kernel runs at the HBM-streaming bound for the input.
- The within-row first-order gap recurrence
      Y[j] = be * Y[j-1] + q[j]
  has a constant coefficient, so its closure is the lower-triangular Toeplitz
  matrix T[k, j] = be^(j-k) (j >= k) and the whole row solve is ONE matmul
  ``q @ T`` on the MXU instead of a log-depth vector scan on the VPU.
- Shift-by-one along the lane axis is a circular ``pltpu.roll`` plus a lane
  mask (no unaligned VMEM slicing).

The recursion (0-based, states zero at virtual column -1 / row -1):

    M[i,j] = e[i,j] * (1 + M[i-1,j-1] + X[i-1,j-1] + Y[i-1,j-1])
    X[i,j] = bg * M[i-1,j] + be * X[i-1,j]
    Y[i,j] = bg * (M[i,j-1] + X[i,j-1]) + be * Y[i,j-1]
    K      = 1 + sum_{i,j} M[i,j]

with e = exp(beta * s) masked to the true (lx, ly) rectangle, bg =
exp(beta*gap), be = exp(beta*ext).  The telescoped ``1 + sum M`` form matches
the reference's 1 + X2[n][m] + Y2[n][m] + M[n][m] return value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift1(v: jax.Array, lane_iota: jax.Array) -> jax.Array:
    """out[:, j] = v[:, j-1], out[:, 0] = 0 (shift right along lanes)."""
    rolled = pltpu.roll(v, shift=1, axis=1)
    return jnp.where(lane_iota >= 1, rolled, 0.0)


def _la_exp_kernel(params_ref, *refs):
    """refs: score slab(s) + lx, ly, T, out, scratches.  With two score
    slabs the emission argument is the affine alpha*s0 + s1 fused in-VMEM
    (saves materializing the combined score tensor in HBM)."""
    two = len(refs) == 9
    if two:
        s_ref, s2_ref, lx_ref, ly_ref, t_ref, out_ref, m_sc, x_sc, y_sc = refs
    else:
        s_ref, lx_ref, ly_ref, t_ref, out_ref, m_sc, x_sc, y_sc = refs
    i = pl.program_id(1)
    beta = params_ref[0, 0]
    bg = params_ref[0, 1]
    be = params_ref[0, 2]

    bb, ly = m_sc.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ly), 1)

    @pl.when(i == 0)
    def _():
        m_sc[:] = jnp.zeros_like(m_sc)
        x_sc[:] = jnp.zeros_like(x_sc)
        y_sc[:] = jnp.zeros_like(y_sc)
        out_ref[:] = jnp.ones_like(out_ref)  # the "+1" empty alignment

    colmask = lane_iota < ly_ref[:]          # (BB, Ly) via (BB, 1) broadcast
    rowmask = i < lx_ref[:]                  # (BB, 1)
    s_row = params_ref[0, 3] * s_ref[0] + s2_ref[0] if two else s_ref[0]
    e = jnp.where(colmask & rowmask, jnp.exp(beta * s_row), 0.0)

    mp, xp, yp = m_sc[:], x_sc[:], y_sc[:]
    m = e * (1.0 + _shift1(mp + xp + yp, lane_iota))
    x = bg * mp + be * xp
    q = bg * _shift1(m + x, lane_iota)
    # HIGHEST: full-f32 MXU passes — the closure sum spans up to Ly terms of
    # wildly different magnitude, and bf16 passes cost ~0.5% kernel-value error
    y = jnp.dot(q, t_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    m_sc[:] = m
    x_sc[:] = x
    y_sc[:] = y
    out_ref[:] += jnp.sum(m, axis=1, keepdims=True)


def _closure_matrix(log_be: jax.Array, ly: int) -> jax.Array:
    """T[k, j] = be^(j-k) for j >= k else 0 — the Y-recurrence closure."""
    k = jnp.arange(ly)[:, None]
    j = jnp.arange(ly)[None, :]
    d = (j - k).astype(jnp.float32)
    return jnp.where(j >= k, jnp.exp(log_be * d), 0.0)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def la_exp_pallas(
    scores: jax.Array,
    lx: jax.Array,
    ly: jax.Array,
    beta,
    gap,
    ext,
    *,
    scores2: jax.Array | None = None,
    alpha=1.0,
    block_b: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Sum-over-alignments LA kernel values (B,) via the fused Pallas DP.

    scores: (B, Lx, Ly) float32; lx, ly: (B,) int32 true lengths; beta, gap,
    ext: scalars.  Equivalent to ``local_alignment_exp(scores,
    pair_mask(lx, Lx, ly, Ly), beta, gap, ext)`` (validated in
    tests/test_bpla.py).
    """
    bsz, max_lx, max_ly = scores.shape
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, jnp.exp(beta * jnp.asarray(gap, dt)), jnp.exp(log_be),
         jnp.asarray(alpha, dt)]
    ).reshape(1, 4)

    bb = min(block_b, _round_up(bsz, SUBLANE))
    bb = _round_up(bb, SUBLANE)
    b_pad = _round_up(bsz, bb)
    ly_pad = _round_up(max_ly, LANE)

    def stream(x):  # (Lx, B, Ly) row-major stream
        x = jnp.swapaxes(x.astype(dt), 0, 1)
        return jnp.pad(x, ((0, 0), (0, b_pad - bsz), (0, ly_pad - max_ly)))

    slabs = [stream(scores)] + ([stream(scores2)] if scores2 is not None else [])
    lx_c = jnp.pad(jnp.asarray(lx, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    ly_c = jnp.pad(jnp.asarray(ly, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    t_mat = _closure_matrix(log_be, ly_pad)

    slab_spec = pl.BlockSpec((1, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, max_lx)
    out = pl.pallas_call(
        _la_exp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            *([slab_spec] * len(slabs)),
            pl.BlockSpec((bb, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ly_pad, ly_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), dt),
        scratch_shapes=[
            pltpu.VMEM((bb, ly_pad), dt),
            pltpu.VMEM((bb, ly_pad), dt),
            pltpu.VMEM((bb, ly_pad), dt),
        ],
        cost_estimate=pl.CostEstimate(
            # ~12 VPU ops per cell + the (BB,Ly)@(Ly,Ly) closure matmul per row
            flops=12 * b_pad * max_lx * ly_pad
            + 2 * b_pad * max_lx * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * max_lx * ly_pad * (1 + len(slabs)),
            transcendentals=b_pad * max_lx * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, t_mat)
    return out[:bsz, 0]


NEG = -1e30


def _shift1_log(v: jax.Array, lane_iota: jax.Array) -> jax.Array:
    """Log-domain shift: out[:, j] = v[:, j-1], out[:, 0] = NEG (log 0)."""
    rolled = pltpu.roll(v, shift=1, axis=1)
    return jnp.where(lane_iota >= 1, rolled, NEG)


def _la_log_kernel(params_ref, *refs):
    """True log-space LA DP; the Y gap closure is a per-row-rescaled matmul.

    The M/X updates use elementwise logaddexp on the VPU (exact log space —
    the "+1" fresh-start floor at every cell costs nothing here, unlike a
    globally-scaled exp DP which cannot represent it once the scale exceeds
    the f32 range).  The within-row Y recurrence
        Y[j] = logaddexp(lbe + Y[j-1], q[j])
    is closed as Y = c + log(exp(q - c) @ T) with c = rowmax(q) and
    T[k, j] = exp(lbe (j-k)): one MXU matmul instead of a sequential scan.
    The rescale drops Y terms > ~87 log units below the row max of q —
    negligible since Y only carries decaying gap mass (be < 1) that re-enters
    M alongside the exactly-kept M/X terms of the same columns.
    """
    two = len(refs) == 9
    if two:
        s_ref, s2_ref, lx_ref, ly_ref, t_ref, acc_ref, m_sc, x_sc, y_sc = refs
    else:
        s_ref, lx_ref, ly_ref, t_ref, acc_ref, m_sc, x_sc, y_sc = refs
    i = pl.program_id(1)
    beta = params_ref[0, 0]
    lbg = params_ref[0, 1]
    lbe = params_ref[0, 2]

    bb, ly = m_sc.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ly), 1)

    @pl.when(i == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        x_sc[:] = jnp.full_like(x_sc, NEG)
        y_sc[:] = jnp.full_like(y_sc, NEG)
        acc_ref[:] = jnp.full_like(acc_ref, NEG)

    colmask = lane_iota < ly_ref[:]
    rowmask = i < lx_ref[:]
    s_row = params_ref[0, 3] * s_ref[0] + s2_ref[0] if two else s_ref[0]
    le = jnp.where(colmask & rowmask, beta * s_row, NEG)

    lm, lx_, ly_ = m_sc[:], x_sc[:], y_sc[:]
    # lse3 of the previous states (elementwise, 3 exps + 1 log)
    c3 = jnp.maximum(lm, jnp.maximum(lx_, ly_))
    lse3 = c3 + jnp.log(
        jnp.exp(lm - c3) + jnp.exp(lx_ - c3) + jnp.exp(ly_ - c3)
    )
    m = le + jnp.logaddexp(0.0, _shift1_log(lse3, lane_iota))
    x = jnp.logaddexp(lbg + lm, lbe + lx_)
    # one shared row scale: em/ex serve the Y closure AND the row-lse of M
    r = jnp.max(jnp.maximum(m, x), axis=1, keepdims=True)
    em = jnp.exp(m - r)
    ex = jnp.exp(x - r)
    ey = jnp.dot(_shift1(em + ex, lane_iota), t_ref[:],
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    y = (r + lbg) + jnp.log(jnp.maximum(ey, 1e-38))

    m_sc[:] = m
    x_sc[:] = x
    y_sc[:] = y
    rowlse = r[:, 0:1] + jnp.log(
        jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1e-38)
    )
    acc_ref[:] = jnp.logaddexp(acc_ref[:], rowlse)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def la_log_pallas(
    scores: jax.Array,
    lx: jax.Array,
    ly: jax.Array,
    beta,
    gap,
    ext,
    *,
    scores2: jax.Array | None = None,
    alpha=1.0,
    block_b: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """log K of the sum-over-alignments LA kernel, overflow-safe for any L.

    Equivalent to ``local_alignment_log`` (stem_kernel_tpu/models/bpla.py) but
    runs the scaled exp-domain DP on the MXU instead of logaddexp per cell.
    """
    bsz, max_lx, max_ly = scores.shape
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, beta * jnp.asarray(gap, dt), log_be, jnp.asarray(alpha, dt)]
    ).reshape(1, 4)

    bb = min(block_b, _round_up(bsz, SUBLANE))
    bb = _round_up(bb, SUBLANE)
    b_pad = _round_up(bsz, bb)
    ly_pad = _round_up(max_ly, LANE)

    def stream(x):
        x = jnp.swapaxes(x.astype(dt), 0, 1)
        return jnp.pad(x, ((0, 0), (0, b_pad - bsz), (0, ly_pad - max_ly)))

    slabs = [stream(scores)] + ([stream(scores2)] if scores2 is not None else [])
    lx_c = jnp.pad(jnp.asarray(lx, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    ly_c = jnp.pad(jnp.asarray(ly, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    t_mat = _closure_matrix(log_be, ly_pad)

    slab_spec = pl.BlockSpec((1, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, max_lx)
    acc = pl.pallas_call(
        _la_log_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            *([slab_spec] * len(slabs)),
            pl.BlockSpec((bb, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ly_pad, ly_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), dt),
        scratch_shapes=[
            pltpu.VMEM((bb, ly_pad), dt),
            pltpu.VMEM((bb, ly_pad), dt),
            pltpu.VMEM((bb, ly_pad), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=24 * b_pad * max_lx * ly_pad
            + 2 * b_pad * max_lx * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * max_lx * ly_pad * (1 + len(slabs)),
            transcendentals=10 * b_pad * max_lx * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, t_mat)
    return jnp.logaddexp(0.0, acc[:bsz, 0])


def la_log_auto(scores, lx, ly, beta, gap, ext, *, block_b: int = 512):
    """Dispatch: scaled-domain Pallas on TPU, log-space scan elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return la_log_pallas(scores, lx, ly, beta, gap, ext, block_b=block_b)
    from ..models.bpla import local_alignment_log, pair_mask

    mask = pair_mask(jnp.asarray(lx), scores.shape[1],
                     jnp.asarray(ly), scores.shape[2])
    return local_alignment_log(scores, mask, beta, gap, ext)


def la_exp_affine_auto(w_pair, w_unpair, lx, ly, alpha, beta, gap, ext, *,
                       block_b: int = 512):
    """exp-space LA on scores = alpha*w_pair + w_unpair, fused in-kernel on
    TPU (the combined score tensor never materializes in HBM)."""
    if jax.default_backend() in ("tpu", "axon"):
        return la_exp_pallas(w_pair, lx, ly, beta, gap, ext,
                             scores2=w_unpair, alpha=alpha, block_b=block_b)
    from ..models.bpla import local_alignment_exp, pair_mask

    scores = jnp.asarray(alpha, w_pair.dtype) * w_pair + w_unpair
    mask = pair_mask(jnp.asarray(lx), scores.shape[1],
                     jnp.asarray(ly), scores.shape[2])
    return local_alignment_exp(scores, mask, beta, gap, ext)


def la_log_affine_auto(w_pair, w_unpair, lx, ly, alpha, beta, gap, ext, *,
                       block_b: int = 512):
    """log-space LA on scores = alpha*w_pair + w_unpair (fused on TPU)."""
    if jax.default_backend() in ("tpu", "axon"):
        return la_log_pallas(w_pair, lx, ly, beta, gap, ext,
                             scores2=w_unpair, alpha=alpha, block_b=block_b)
    from ..models.bpla import local_alignment_log, pair_mask

    scores = jnp.asarray(alpha, w_pair.dtype) * w_pair + w_unpair
    mask = pair_mask(jnp.asarray(lx), scores.shape[1],
                     jnp.asarray(ly), scores.shape[2])
    return local_alignment_log(scores, mask, beta, gap, ext)


def la_exp_auto(scores, lx, ly, beta, gap, ext, *, block_b: int = 512):
    """Dispatch: Pallas on TPU, interpreter-free scan fallback elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return la_exp_pallas(scores, lx, ly, beta, gap, ext, block_b=block_b)
    from ..models.bpla import local_alignment_exp, pair_mask

    mask = pair_mask(jnp.asarray(lx), scores.shape[1],
                     jnp.asarray(ly), scores.shape[2])
    return local_alignment_exp(scores, mask, beta, gap, ext)
