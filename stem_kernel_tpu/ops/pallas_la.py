"""Pallas TPU kernel for the 5-state local-alignment (BPLA/LA) DP.

This is the fused-VMEM version of
:func:`stem_kernel_tpu.models.bpla.local_alignment_exp` — the hottest loop of
the reference (/root/reference/bpla_kernel/bpla_kernel.cpp:64-115 inside the
pair loop of /root/reference/common/kernel_matrix.cpp:44-56).

Design (TPU-first, see /opt/skills/guides/pallas_guide.md):

- The score tensor is streamed in row-major ``(Lx, B, Ly)`` layout so each
  grid step DMAs one tile-aligned ``(BB, Ly)`` row slab from HBM into VMEM
  while the previous slab computes (Pallas double-buffers grid inputs).
- The M/A/G state rows persist in VMEM scratch across the inner row loop;
  nothing round-trips to HBM except the score reads and the final (B,)
  values.

**Closure reformulation (round 5).**  Eliminating X and Y from the 5-state
recursion

    M[i,j] = e[i,j] * (1 + M[i-1,j-1] + X[i-1,j-1] + Y[i-1,j-1])
    X[i,j] = bg * M[i-1,j] + be * X[i-1,j]
    Y[i,j] = bg * (M[i,j-1] + X[i,j-1]) + be * Y[i,j-1]

yields the M-only form with a RANK-1 SEPARABLE dependency weight

    M[i,j] = e[i,j] * (1 + sum_{i'<i, j'<j} u(i-i') u(j-j') M[i',j'])
    u(1) = 1,  u(d) = bg * be^(d-2)  for d >= 2

(u(1) is the direct diagonal step; u(d>=2) opens one gap then extends).
Defining the within-row closure A[i,:] = M[i,:] @ Tu with the Toeplitz
matrix Tu[k,j] = u(j-k) (zero main diagonal — the column shift is absorbed
into Tu), and the across-row geometric carry G[i] = be*G[i-1] + A[i-1],
each row costs

    m = e * (1 + a + bg*g);   a' = m @ Tu;   g' = be*g + a

i.e. ONE MXU matmul plus ~4 elementwise VPU ops — and ZERO lane-shift /
roll / select ops, which the round-4 Mosaic cost probes (BASELINE.md)
measured at ~1-2 us each and which dominated the previous 2-shift
formulation's 8-op dependent chain.

The reference recursion's value telescopes to K = 1 + sum_{i,j} M[i,j]
(matching 1 + X2[n][m] + Y2[n][m] + M[n][m]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _u_closure_matrix(log_bg: jax.Array, log_be: jax.Array, n: int) -> jax.Array:
    """Tu[k, j] = u(j-k): 1 at j=k+1, bg*be^(j-k-2) at j>=k+2, else 0.

    The strictly-upper-triangular (zero-diagonal) closure of the separable
    dependency weight — one matmul by Tu applies both the column shift and
    the full gap-open/extend geometric tail of the Y recurrence.
    """
    k = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    d = (j - k).astype(jnp.float32)
    geo = jnp.exp(log_bg + log_be * jnp.maximum(d - 2.0, 0.0))
    return jnp.where(d == 1, 1.0, jnp.where(d >= 2, geo, 0.0))


def _la_exp_kernel(params_ref, *refs, k_rows: int, precision):
    """refs: score slab(s) + lx, ly, Tu, out, scratches.  With two score
    slabs the emission argument is the affine alpha*s0 + s1 fused in-VMEM
    (saves materializing the combined score tensor in HBM).

    Each grid step consumes ``k_rows`` x-rows (an unrolled inner loop over a
    (k_rows, BB, Ly) slab): the fixed per-step cost (DMA issue, semaphores,
    scalar-core loop) dominated single-row steps ~10x over the actual
    VPU+MXU work, so amortizing it over k_rows is worth ~3x end to end.
    """
    two = len(refs) == 8
    if two:
        s_ref, s2_ref, lx_ref, ly_ref, tu_ref, out_ref, a_sc, g_sc = refs
    else:
        s_ref, lx_ref, ly_ref, tu_ref, out_ref, a_sc, g_sc = refs
    i = pl.program_id(1)
    beta = params_ref[0, 0]
    bg = params_ref[0, 1]
    be = params_ref[0, 2]

    bb, ly = a_sc.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ly), 1)

    @pl.when(i == 0)
    def _():
        a_sc[:] = jnp.zeros_like(a_sc)
        g_sc[:] = jnp.zeros_like(g_sc)
        out_ref[:] = jnp.ones_like(out_ref)  # the "+1" empty alignment

    colmask = lane_iota < ly_ref[:]          # (BB, Ly) via (BB, 1) broadcast
    a, g = a_sc[:], g_sc[:]
    acc = jnp.zeros_like(out_ref[:])
    for k in range(k_rows):
        rowmask = i * k_rows + k < lx_ref[:]     # (BB, 1)
        s_row = params_ref[0, 3] * s_ref[k] + s2_ref[k] if two else s_ref[k]
        e = jnp.where(colmask & rowmask, jnp.exp(beta * s_row), 0.0)

        m = e * (1.0 + a + bg * g)
        # HIGH default: the closure sum spans up to Ly geometric terms; the
        # 3-pass split keeps relative error ~1e-4 over 128 compounded rows
        # (measured; --precision highest restores full-f32 6-pass validation)
        a_new = jnp.dot(m, tu_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)
        g = be * g + a
        a = a_new
        acc += jnp.sum(m, axis=1, keepdims=True)

    a_sc[:] = a
    g_sc[:] = g
    out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("block_b", "row_block", "interpret", "precision"))
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
    precision: str = "highest",
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
    log_bg = beta * jnp.asarray(gap, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, jnp.exp(log_bg), jnp.exp(log_be), jnp.asarray(alpha, dt)]
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
    tu_mat = _u_closure_matrix(log_bg, log_be, ly_pad)

    slab_spec = pl.BlockSpec((kr, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, lx_pad // kr)
    out = pl.pallas_call(
        functools.partial(_la_exp_kernel, k_rows=kr,
                          precision=_PRECISIONS[precision]),
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
        ],
        cost_estimate=pl.CostEstimate(
            # ~6 VPU ops per cell + the (BB,Ly)@(Ly,Ly) closure matmul per row
            flops=6 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * lx_pad * ly_pad * (1 + len(slabs)),
            transcendentals=b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, tu_mat)
    return out[:bsz, 0]


NEG = -1e30


def _la_log_kernel(params_ref, *refs, k_rows: int, precision):
    """Log-space LA DP in the closure form; the Tu closure is a per-row-
    rescaled matmul.

    States are log A and log G (elementwise logaddexp carries — exact log
    space).  The within-row closure A = M @ Tu is evaluated as
    A = exp(r) * (exp(m - r) @ Tu) with r = rowmax(m): one MXU matmul per
    row.  The rescale drops M terms > ~87 log units below the row max —
    negligible since they enter A alongside exactly-kept same-row terms.
    """
    two = len(refs) == 8
    if two:
        s_ref, s2_ref, lx_ref, ly_ref, tu_ref, acc_ref, a_sc, g_sc = refs
    else:
        s_ref, lx_ref, ly_ref, tu_ref, acc_ref, a_sc, g_sc = refs
    i = pl.program_id(1)
    beta = params_ref[0, 0]
    lbg = params_ref[0, 1]
    lbe = params_ref[0, 2]

    bb, ly = a_sc.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ly), 1)

    @pl.when(i == 0)
    def _():
        a_sc[:] = jnp.full_like(a_sc, NEG)
        g_sc[:] = jnp.full_like(g_sc, NEG)
        acc_ref[:] = jnp.full_like(acc_ref, NEG)

    colmask = lane_iota < ly_ref[:]
    la, lg = a_sc[:], g_sc[:]
    acc = jnp.full_like(acc_ref[:], NEG)
    for k in range(k_rows):
        rowmask = i * k_rows + k < lx_ref[:]
        s_row = params_ref[0, 3] * s_ref[k] + s2_ref[k] if two else s_ref[k]
        le = jnp.where(colmask & rowmask, beta * s_row, NEG)

        s = jnp.logaddexp(la, lbg + lg)
        m = le + jnp.logaddexp(0.0, s)
        r = jnp.max(m, axis=1, keepdims=True)
        em = jnp.exp(m - r)
        av = jnp.dot(em, tu_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
        lg = jnp.logaddexp(lbe + lg, la)
        la = r + jnp.log(jnp.maximum(av, 1e-38))
        acc = jnp.logaddexp(
            acc,
            r[:, 0:1]
            + jnp.log(jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1e-38)),
        )

    a_sc[:] = la
    g_sc[:] = lg
    acc_ref[:] = jnp.logaddexp(acc_ref[:], acc)


@functools.partial(
    jax.jit, static_argnames=("block_b", "row_block", "interpret", "precision"))
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
    precision: str = "highest",
) -> jax.Array:
    """log K of the sum-over-alignments LA kernel, overflow-safe for any L.

    Equivalent to ``local_alignment_log`` (stem_kernel_tpu/models/bpla.py) but
    runs the rescaled exp-domain closure on the MXU instead of logaddexp per
    cell.  ``row_block``: x-rows per grid step (amortizes per-step costs).
    """
    bsz, max_lx, max_ly = scores.shape
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_bg = beta * jnp.asarray(gap, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, log_bg, log_be, jnp.asarray(alpha, dt)]
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
    tu_mat = _u_closure_matrix(log_bg, log_be, ly_pad)

    slab_spec = pl.BlockSpec((kr, bb, ly_pad), lambda b, i: (i, b, 0),
                             memory_space=pltpu.VMEM)
    grid = (b_pad // bb, lx_pad // kr)
    acc = pl.pallas_call(
        functools.partial(_la_log_kernel, k_rows=kr,
                          precision=_PRECISIONS[precision]),
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
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * lx_pad * ly_pad * (1 + len(slabs)),
            transcendentals=6 * b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, *slabs, lx_c, ly_c, tu_mat)
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


def _la_exp_fac_kernel(params_ref, fx_ref, fy_ref, tu_ref,
                       out_ref, a_sc, g_sc, ms_sc, *, precision):
    i = pl.program_id(1)
    bg = params_ref[0, 1]
    be = params_ref[0, 2]

    @pl.when(i == 0)
    def _():
        a_sc[:] = jnp.zeros_like(a_sc)
        g_sc[:] = jnp.zeros_like(g_sc)
        ms_sc[:] = jnp.zeros_like(ms_sc)

    fx = fx_ref[0]
    planes = [fy_ref[k] for k in range(K8)]
    a, g = a_sc[:], g_sc[:]
    msum = ms_sc[:]
    for r in range(RG):
        e = jnp.exp(_emit_row(fx, planes, r * K8))  # masked cells: exp(-1e7)=0
        m = e * (1.0 + a + bg * g)
        a_new = jnp.dot(m, tu_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)
        g = be * g + a
        a = a_new
        msum = msum + m  # the row-sum reduction is deferred to the last step

    a_sc[:] = a
    g_sc[:] = g
    ms_sc[:] = msum
    # unconditional write, last grid step wins (a @pl.when-guarded output
    # write hangs the Mosaic compile); still one reduction per RG rows
    out_ref[:] = 1.0 + jnp.sum(msum, axis=1, keepdims=True)


def _la_log_fac_kernel(params_ref, fx_ref, fy_ref, tu_ref,
                       acc_ref, a_sc, g_sc, *, precision):
    i = pl.program_id(1)
    lbg = params_ref[0, 1]
    lbe = params_ref[0, 2]

    @pl.when(i == 0)
    def _():
        a_sc[:] = jnp.full_like(a_sc, NEG)
        g_sc[:] = jnp.full_like(g_sc, NEG)
        acc_ref[:] = jnp.full_like(acc_ref, NEG)

    fx = fx_ref[0]
    planes = [fy_ref[k] for k in range(K8)]
    la, lg = a_sc[:], g_sc[:]
    acc = jnp.full_like(acc_ref[:], NEG)
    for r_ in range(RG):
        le = _emit_row(fx, planes, r_ * K8)  # masked cells: -1e7 ~ log 0

        s = jnp.logaddexp(la, lbg + lg)
        m = le + jnp.logaddexp(0.0, s)
        r = jnp.max(m, axis=1, keepdims=True)
        em = jnp.exp(m - r)
        av = jnp.dot(em, tu_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
        lg = jnp.logaddexp(lbe + lg, la)
        la = r + jnp.log(jnp.maximum(av, 1e-38))
        acc = jnp.logaddexp(
            acc,
            r[:, 0:1]
            + jnp.log(jnp.maximum(jnp.sum(em, axis=1, keepdims=True), 1e-38)),
        )

    a_sc[:] = la
    g_sc[:] = lg
    acc_ref[:] = jnp.logaddexp(acc_ref[:], acc)


def _factored_call(kernel, fx, fy, lx, ly, alpha, beta, params, log_bg,
                   log_be, block_b, interpret, precision, *, n_scratch: int):
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
    tu_mat = _u_closure_matrix(log_bg, log_be, ly_pad)

    grid = (b_pad // bb, lx_pad // RG)
    out = pl.pallas_call(
        functools.partial(kernel, precision=_PRECISIONS[precision]),
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
            for _ in range(n_scratch)
        ],
        cost_estimate=pl.CostEstimate(
            flops=22 * b_pad * lx_pad * ly_pad
            + 2 * b_pad * lx_pad * ly_pad * ly_pad,
            bytes_accessed=4 * b_pad * (lx_pad + ly_pad) * K8,
            transcendentals=b_pad * lx_pad * ly_pad,
        ),
        interpret=interpret,
    )(params, fx_p, fy_p, tu_mat)
    return out[:bsz, 0]


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "precision"))
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
    block_b: int = 512,
    interpret: bool = False,
    precision: str = "highest",
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
    log_bg = beta * jnp.asarray(gap, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, jnp.exp(log_bg), jnp.exp(log_be), jnp.asarray(alpha, dt)]
    ).reshape(1, 4)
    return _factored_call(_la_exp_fac_kernel, fx, fy, lx, ly, alpha, beta,
                          params, log_bg, log_be, block_b, interpret,
                          precision, n_scratch=3)


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "precision"))
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
    block_b: int = 512,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """log K of the LA kernel on factored scores (overflow-safe)."""
    dt = jnp.float32
    beta = jnp.asarray(beta, dt)
    log_bg = beta * jnp.asarray(gap, dt)
    log_be = beta * jnp.asarray(ext, dt)
    params = jnp.stack(
        [beta, log_bg, log_be, jnp.asarray(alpha, dt)]
    ).reshape(1, 4)
    acc = _factored_call(_la_log_fac_kernel, fx, fy, lx, ly, alpha, beta,
                         params, log_bg, log_be, block_b, interpret,
                         precision, n_scratch=2)
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
