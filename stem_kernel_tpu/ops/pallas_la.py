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


def _la_exp_kernel(params_ref, *refs, k_rows: int):
    """refs: score slab(s) + lx, ly, T, out, scratches.  With two score
    slabs the emission argument is the affine alpha*s0 + s1 fused in-VMEM
    (saves materializing the combined score tensor in HBM).

    Each grid step consumes ``k_rows`` x-rows (an unrolled inner loop over a
    (k_rows, BB, Ly) slab): the fixed per-step cost (DMA issue, semaphores,
    scalar-core loop) dominated single-row steps ~10x over the actual
    VPU+MXU work, so amortizing it over k_rows is worth ~3x end to end.
    """
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
    mp, xp, yp = m_sc[:], x_sc[:], y_sc[:]
    acc = jnp.zeros_like(out_ref[:])
    for k in range(k_rows):
        rowmask = i * k_rows + k < lx_ref[:]     # (BB, 1)
        s_row = params_ref[0, 3] * s_ref[k] + s2_ref[k] if two else s_ref[k]
        e = jnp.where(colmask & rowmask, jnp.exp(beta * s_row), 0.0)

        m = e * (1.0 + _shift1(mp + xp + yp, lane_iota))
        x = bg * mp + be * xp
        q = bg * _shift1(m + x, lane_iota)
        # HIGHEST: full-f32 MXU passes — the closure sum spans up to Ly terms
        # of wildly different magnitude, and bf16 passes cost ~0.5% kernel-
        # value error
        y = jnp.dot(q, t_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        mp, xp, yp = m, x, y
        acc += jnp.sum(m, axis=1, keepdims=True)

    m_sc[:] = mp
    x_sc[:] = xp
    y_sc[:] = yp
    out_ref[:] += acc


def _closure_matrix(log_be: jax.Array, ly: int) -> jax.Array:
    """T[k, j] = be^(j-k) for j >= k else 0 — the Y-recurrence closure."""
    k = jnp.arange(ly)[:, None]
    j = jnp.arange(ly)[None, :]
    d = (j - k).astype(jnp.float32)
    return jnp.where(j >= k, jnp.exp(log_be * d), 0.0)


@functools.partial(jax.jit, static_argnames=("block_b", "row_block", "interpret"))
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
    row_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Sum-over-alignments LA kernel values (B,) via the fused Pallas DP.

    scores: (B, Lx, Ly) float32; lx, ly: (B,) int32 true lengths; beta, gap,
    ext: scalars.  Equivalent to ``local_alignment_exp(scores,
    pair_mask(lx, Lx, ly, Ly), beta, gap, ext)`` (validated in
    tests/test_bpla.py).  ``row_block``: x-rows per grid step.
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
    kr = max(1, min(row_block, max_lx))
    lx_pad = _round_up(max_lx, kr)

    def stream(x):  # (Lx, B, Ly) row-major stream
        x = jnp.swapaxes(x.astype(dt), 0, 1)
        return jnp.pad(
            x, ((0, lx_pad - max_lx), (0, b_pad - bsz), (0, ly_pad - max_ly))
        )

    slabs = [stream(scores)] + ([stream(scores2)] if scores2 is not None else [])
    lx_c = jnp.pad(jnp.asarray(lx, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    ly_c = jnp.pad(jnp.asarray(ly, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    t_mat = _closure_matrix(log_be, ly_pad)

    slab_spec = pl.BlockSpec((kr, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, lx_pad // kr)
    out = pl.pallas_call(
        functools.partial(_la_exp_kernel, k_rows=kr),
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
            flops=12 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * lx_pad * ly_pad * (1 + len(slabs)),
            transcendentals=b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, t_mat)
    return out[:bsz, 0]


NEG = -1e30


def _shift1_log(v: jax.Array, lane_iota: jax.Array) -> jax.Array:
    """Log-domain shift: out[:, j] = v[:, j-1], out[:, 0] = NEG (log 0)."""
    rolled = pltpu.roll(v, shift=1, axis=1)
    return jnp.where(lane_iota >= 1, rolled, NEG)


def _la_log_kernel(params_ref, *refs, k_rows: int):
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
    lm, lx_, ly_ = m_sc[:], x_sc[:], y_sc[:]
    acc = jnp.full_like(acc_ref[:], NEG)
    for k in range(k_rows):
        rowmask = i * k_rows + k < lx_ref[:]
        s_row = params_ref[0, 3] * s_ref[k] + s2_ref[k] if two else s_ref[k]
        le = jnp.where(colmask & rowmask, beta * s_row, NEG)

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

        lm, lx_, ly_ = m, x, y
        rowlse = r[:, 0:1] + jnp.log(
            jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1e-38)
        )
        acc = jnp.logaddexp(acc, rowlse)

    m_sc[:] = lm
    x_sc[:] = lx_
    y_sc[:] = ly_
    acc_ref[:] = jnp.logaddexp(acc_ref[:], acc)


@functools.partial(jax.jit, static_argnames=("block_b", "row_block", "interpret"))
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
    row_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """log K of the sum-over-alignments LA kernel, overflow-safe for any L.

    Equivalent to ``local_alignment_log`` (stem_kernel_tpu/models/bpla.py) but
    runs the scaled exp-domain DP on the MXU instead of logaddexp per cell.
    ``row_block``: x-rows per grid step (amortizes per-step fixed costs).
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
    kr = max(1, min(row_block, max_lx))
    lx_pad = _round_up(max_lx, kr)

    def stream(x):
        x = jnp.swapaxes(x.astype(dt), 0, 1)
        return jnp.pad(
            x, ((0, lx_pad - max_lx), (0, b_pad - bsz), (0, ly_pad - max_ly))
        )

    slabs = [stream(scores)] + ([stream(scores2)] if scores2 is not None else [])
    lx_c = jnp.pad(jnp.asarray(lx, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    ly_c = jnp.pad(jnp.asarray(ly, jnp.int32), (0, b_pad - bsz)).reshape(-1, 1)
    t_mat = _closure_matrix(log_be, ly_pad)

    slab_spec = pl.BlockSpec((kr, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, lx_pad // kr)
    acc = pl.pallas_call(
        functools.partial(_la_log_kernel, k_rows=kr),
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
            flops=24 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * lx_pad * ly_pad * (1 + len(slabs)),
            transcendentals=10 * b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, t_mat)
    return jnp.logaddexp(0.0, acc[:bsz, 0])


# ----------------------------------------------------------------- factored
#
# The BPLA score tensor is LOW-RANK: s[i,j] = alpha*(pr_x[i]pr_y[j] +
# pl_x[i]pl_y[j]) + (u_x[i]px[i,:]@S)·(u_y[j]py[j,:]) — rank 2 + N_RNA = 6
# (models/bpla.py:bpla_score_parts).  Materializing (B, Lx, Ly) scores in HBM
# made the kernel DMA-bound: measured effective HBM read bandwidth on this
# chip is ~26 GB/s per stream, so two 32 MB slabs per 512-pair batch cost
# ~1.4 ms while the actual DP compute is ~10x cheaper.  The factored kernels
# stream (B, L, K) factor tensors instead (~20x less HBM traffic) and build
# each emission row in VMEM with K broadcast-FMAs.
#
# Layout: a lane dimension of K8=8 would pad 16x in (8,128)-tiled memory, so
# the x factors are packed RG=16 rows per lane vector — fx_packed[g, b,
# r*K8 + k] = fx[b, g*RG + r, k] fills all 128 lanes exactly.  The y factors
# are K resident (BB, Ly) planes (one constant-index block, DMA'd once per
# batch block).

RG = 16  # x-rows packed per 128-lane factor vector (= grid rows per step)
K8 = 8   # factor slots per row (rank 6 + 2 mask slots)
MASKVAL = -1e7  # additive score mask: exp(MASKVAL) == 0, f32-safe to sum


def _prescale_x(fx, lx, alpha, beta, b_pad, lx_pad):
    """Pre-scale + pack x factors: (B, Lx, K) -> (Lx_pad/RG, b_pad, RG*K8).

    Slots 0,1 carry alpha*beta, 2..K-1 carry beta (so the in-kernel emission
    is a bare 8-slot dot product); slot K8-2 is the constant 1 (pairs with
    the y-side column mask); slot K8-1 is the ROW mask (MASKVAL on rows
    >= lx, 0 inside) so masking costs zero in-kernel ops.
    """
    bsz, max_lx, k = fx.shape
    fx = fx * jnp.concatenate(
        [jnp.full((2,), alpha * beta), jnp.full((k - 2,), beta)]
    ).astype(jnp.float32)
    fx = jnp.pad(
        fx.astype(jnp.float32),
        ((0, b_pad - bsz), (0, lx_pad - max_lx), (0, K8 - 2 - k)),
    )
    lx_p = jnp.pad(jnp.asarray(lx, jnp.int32), (0, b_pad - bsz))
    rows = jnp.arange(lx_pad, dtype=jnp.int32)
    rowmask = jnp.where(rows[None, :] < lx_p[:, None], 0.0, MASKVAL)
    ones = jnp.ones((b_pad, lx_pad, 1), jnp.float32)
    fx = jnp.concatenate([fx, ones, rowmask[:, :, None]], axis=-1)
    return (
        fx.reshape(b_pad, lx_pad // RG, RG, K8)
        .transpose(1, 0, 2, 3)
        .reshape(lx_pad // RG, b_pad, RG * K8)
    )


def _prescale_y(fy, ly, b_pad, ly_pad):
    """Pack y factors: (B, Ly, K) -> (K8, b_pad, ly_pad) plane layout.

    Plane K8-2 is the COLUMN mask (MASKVAL on cols >= ly), plane K8-1 the
    constant 1 (pairs with the x-side row mask).
    """
    bsz, max_ly, k = fy.shape
    fy = jnp.pad(
        fy.astype(jnp.float32),
        ((0, b_pad - bsz), (0, ly_pad - max_ly), (0, K8 - 2 - k)),
    )
    ly_p = jnp.pad(jnp.asarray(ly, jnp.int32), (0, b_pad - bsz))
    cols = jnp.arange(ly_pad, dtype=jnp.int32)
    colmask = jnp.where(cols[None, :] < ly_p[:, None], 0.0, MASKVAL)
    ones = jnp.ones((b_pad, ly_pad, 1), jnp.float32)
    fy = jnp.concatenate([fy, colmask[:, :, None], ones], axis=-1)
    return fy.transpose(2, 0, 1)


def _emit_row(fx, planes, base):
    """sum_k fx[:, base+k] * planes[k] — the pre-scaled, pre-masked score."""
    s = fx[:, base : base + 1] * planes[0]
    for k in range(1, K8):
        s = s + fx[:, base + k : base + k + 1] * planes[k]
    return s


def _la_exp_fac_kernel(params_ref, fx_ref, fy_ref, t_ref,
                       out_ref, m_sc, x_sc, y_sc, ms_sc):
    i = pl.program_id(1)
    bg = params_ref[0, 1]
    be = params_ref[0, 2]

    bb, ly = m_sc.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ly), 1)

    @pl.when(i == 0)
    def _():
        m_sc[:] = jnp.zeros_like(m_sc)
        x_sc[:] = jnp.zeros_like(x_sc)
        y_sc[:] = jnp.zeros_like(y_sc)
        ms_sc[:] = jnp.zeros_like(ms_sc)

    fx = fx_ref[0]
    planes = [fy_ref[k] for k in range(K8)]
    mp, xp, yp = m_sc[:], x_sc[:], y_sc[:]
    msum = ms_sc[:]
    for r in range(RG):
        e = jnp.exp(_emit_row(fx, planes, r * K8))  # masked cells: exp(-1e7)=0
        m = e * (1.0 + _shift1(mp + xp + yp, lane_iota))
        x = bg * mp + be * xp
        q = bg * _shift1(m + x, lane_iota)
        y = jnp.dot(q, t_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        mp, xp, yp = m, x, y
        msum = msum + m  # the row-sum reduction is deferred to the last step

    m_sc[:] = mp
    x_sc[:] = xp
    y_sc[:] = yp
    ms_sc[:] = msum
    # unconditional write, last grid step wins (a @pl.when-guarded output
    # write hangs the Mosaic compile); still one reduction per RG rows
    out_ref[:] = 1.0 + jnp.sum(msum, axis=1, keepdims=True)


def _la_log_fac_kernel(params_ref, fx_ref, fy_ref, t_ref,
                       acc_ref, m_sc, x_sc, y_sc):
    i = pl.program_id(1)
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

    fx = fx_ref[0]
    planes = [fy_ref[k] for k in range(K8)]
    lm, lx_, ly_ = m_sc[:], x_sc[:], y_sc[:]
    acc = jnp.full_like(acc_ref[:], NEG)
    for r in range(RG):
        le = _emit_row(fx, planes, r * K8)  # masked cells: -1e7 ~ log 0

        c3 = jnp.maximum(lm, jnp.maximum(lx_, ly_))
        lse3 = c3 + jnp.log(
            jnp.exp(lm - c3) + jnp.exp(lx_ - c3) + jnp.exp(ly_ - c3)
        )
        m = le + jnp.logaddexp(0.0, _shift1_log(lse3, lane_iota))
        x = jnp.logaddexp(lbg + lm, lbe + lx_)
        r_ = jnp.max(jnp.maximum(m, x), axis=1, keepdims=True)
        em = jnp.exp(m - r_)
        ex = jnp.exp(x - r_)
        ey = jnp.dot(_shift1(em + ex, lane_iota), t_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        y = (r_ + lbg) + jnp.log(jnp.maximum(ey, 1e-38))

        lm, lx_, ly_ = m, x, y
        rowlse = r_[:, 0:1] + jnp.log(
            jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1e-38)
        )
        acc = jnp.logaddexp(acc, rowlse)

    m_sc[:] = lm
    x_sc[:] = lx_
    y_sc[:] = ly_
    acc_ref[:] = jnp.logaddexp(acc_ref[:], acc)


def _factored_call(kernel, fx, fy, lx, ly, alpha, beta, params, log_be,
                   block_b, interpret, *, extra_scratch: int = 0):
    bsz, max_lx, k = fx.shape
    if k > K8 - 2:
        raise ValueError(
            f"factored LA kernels support rank <= {K8 - 2} (got K={k}); "
            "use la_exp_affine_auto / la_log_affine_auto for higher-rank "
            "score tables"
        )
    max_ly = fy.shape[1]
    bb = min(block_b, _round_up(bsz, SUBLANE))
    bb = _round_up(bb, SUBLANE)
    b_pad = _round_up(bsz, bb)
    ly_pad = _round_up(max_ly, LANE)
    lx_pad = _round_up(max_lx, RG)

    fx_p = _prescale_x(fx, lx, alpha, beta, b_pad, lx_pad)
    fy_p = _prescale_y(fy, ly, b_pad, ly_pad)
    t_mat = _closure_matrix(log_be, ly_pad)

    grid = (b_pad // bb, lx_pad // RG)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bb, RG * K8), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K8, bb, ly_pad), lambda b, i: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ly_pad, ly_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, ly_pad), jnp.float32)
            for _ in range(3 + extra_scratch)
        ],
        cost_estimate=pl.CostEstimate(
            flops=28 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * (lx_pad + ly_pad) * K8,
            transcendentals=b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, fx_p, fy_p, t_mat)
    return out[:bsz, 0]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def la_exp_factored(
    fx: jax.Array,
    fy: jax.Array,
    lx: jax.Array,
    ly: jax.Array,
    alpha,
    beta,
    gap,
    ext,
    *,
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Sum-over-alignments LA kernel on factored scores.

    fx: (B, Lx, K), fy: (B, Ly, K) with s[i,j] = alpha*(fx[...,0]fy[...,0] +
    fx[...,1]fy[...,1]) + sum_{k>=2} fx[...,k]fy[...,k].  Equivalent to
    ``la_exp_pallas`` on the materialized score tensor, at ~20x less HBM
    traffic (the score tensor never exists).

    Masking is additive (MASKVAL = -1e7 added into padded rows/columns), so
    emissions must satisfy |beta * s[i,j]| << 1e7 — true for any physical
    parameterization (BPLA defaults give |beta*s| < 10); exotic score tables
    approaching that magnitude must use the affine/materialized path, whose
    mask is exact.  Rank K is limited to K8-2 = 6 (checked).
    """
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, jnp.exp(beta * jnp.asarray(gap, dt)), jnp.exp(log_be),
         jnp.asarray(alpha, dt)]
    ).reshape(1, 4)
    return _factored_call(_la_exp_fac_kernel, fx, fy, lx, ly, alpha, beta,
                          params, log_be, block_b, interpret, extra_scratch=1)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def la_log_factored(
    fx: jax.Array,
    fy: jax.Array,
    lx: jax.Array,
    ly: jax.Array,
    alpha,
    beta,
    gap,
    ext,
    *,
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """log K of the LA kernel on factored scores (overflow-safe)."""
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, beta * jnp.asarray(gap, dt), log_be, jnp.asarray(alpha, dt)]
    ).reshape(1, 4)
    acc = _factored_call(_la_log_fac_kernel, fx, fy, lx, ly, alpha, beta,
                         params, log_be, block_b, interpret)
    return jnp.logaddexp(0.0, acc)


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
