"""VMEM-resident Pallas kernel for the banded full stem kernel.

The level scan of ``models.full_stem.full_stem_kernel_banded_log`` carries
six (B, n+1, W, W) state tensors through HBM every step — measured at
~19 pairs/s at n=300 (round-4 XLA restructure; round 3's gather-heavy scan
managed 8).  Here the whole state lives in VMEM across the level loop:

- layout: each state is a 2-D (W, (n+1)*W) array — window-k on sublanes,
  (block i, window-l) flattened on lanes.  In this layout every window
  re-anchoring of the staircase algebra (see full_stem.py) is a static
  lane/sublane shift: the block shift i+1 -> i is a lane roll by W, the
  conditional k/l shifts are single-step rolls masked by per-block lane
  rows, and the bp_y window slide is ABSORBED by the block shift (the
  l-anchor of block i+1 at level d-1 equals that of block i at level d).
- the reverse-cumsum k-contractions (K3/G3) are one (W, W) x (W, L) MXU
  matmul each; the l-contractions (K2/G2) are in-window doubling scans on
  lanes (6 rounds at W = 33) because a lane-blocked matmul has no
  MXU form.
- everything the step needs beyond carried state streams in as per-level
  lane rows (bp_x skew column, anchor offsets, shift masks, eq2 window,
  entering bp_y edge row) prefetched by the Pallas grid pipeline: the
  kernel body contains no gathers at all.
- float32 overflow (values grow like 10^(0.15 n)) is handled exactly like
  the scaled McCaskill engine: states are rescaled by max|K0| every 8
  levels, a per-pair log-scale accumulates in SMEM, and the kernel emits
  log K per level.

Grid is (B, n): pairs outer, levels inner — TPU grids run sequentially on
the core, so scratch persists across the level loop and resets at d == 0.

Reference recursion: /root/reference/stem_kernel/stem_kernel.cpp:83-351
(dp_init/dp_update micro-kernels and the banded partial_dp windows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESCALE_EVERY = 8  # levels between state rescales (growth stays << f32 max)


def _kernel(gap: float, stack: float, subst: float, W: int, NB: int, G: int,
            # refs: streams (1,1,1,G*L), resident rows, output, scratch
            bpx_ref, off_ref, dj_ref, e2_ref, egk_ref,
            dk_ref, wl_ref, eq1_ref, bw0_ref,
            out_ref,
            KG0, KG1, G0pp, BW, logS):
    """One level of the banded scan.

    K and G states are STACKED as (2W, L) planes (rows 0..W-1 the K half,
    W..2W-1 the G half): every re-anchor shift, mask application, cascade
    and the C1 contraction touch one combined array instead of two, and the
    G-half's gap factors ride along as per-sublane coefficient columns.
    The in-half sublane shifts are 4-piece concats so halves never mix.
    """
    d_idx = pl.program_id(1)  # level d = d_idx + 1
    L = G * NB * W  # G >= 2: ganged pairs side by side on lanes
    f32 = jnp.float32
    g = f32(gap)
    lng = f32(np.log(gap))

    wl = wl_ref[0, 0, :].astype(jnp.int32)            # lane sub-index l
    wk2 = jax.lax.broadcasted_iota(jnp.int32, (2 * W, L), 0)
    wkm = jnp.where(wk2 >= W, wk2 - W, wk2)           # in-half window row
    # per-half coefficient columns: K rows 1, G rows gap
    cg = jnp.where(wk2[:, :1] >= W, g, f32(1.0))      # (2W, 1)

    @pl.when(d_idx == 0)
    def _init():
        # level-0 states: K0 = 1; G0 = g^(l-k) on l >= k; K1 = G1 = 0
        rel = wl[None, :] - wkm
        KG0[...] = jnp.where(
            wk2 < W, 1.0,
            jnp.where(rel >= 0, jnp.exp(rel.astype(f32) * lng), 0.0),
        )
        KG1[...] = jnp.zeros((2 * W, L), f32)
        G0pp[...] = jnp.zeros((W, L), f32)
        BW[...] = bw0_ref[0, ...]
        logS[0, 0] = f32(0.0)

    dj = dj_ref[0, 0, 0, :] > 0.5   # l-anchor advanced at this level (per block)
    dk = dk_ref[0, 0, :] > 0.5      # k-anchor advances i -> i+1 (d-independent)
    djf = dj_ref[0, 0, 0, :][None, :]   # same masks as f32 rows: arithmetic
    dkf = dk_ref[0, 0, :][None, :]      # blends fuse where selects materialize
    bpx = bpx_ref[0, 0, 0, :]
    off = off_ref[0, 0, 0, :].astype(jnp.int32)
    e2 = e2_ref[0, 0, 0, :]
    egk = egk_ref[0, 0, 0, :]

    def roll_i(x):  # value of block i+1, window-aligned: lanes left by W
        h = x.shape[0]
        return jnp.concatenate([x[:, W:], jnp.zeros((h, W), f32)], axis=1)
    # NOTE: pltpu.roll-based shifts crash the remote Mosaic compile on this
    # toolchain (HTTP 500 from tpu_compile_helper); concat forms stay.

    def kshift2(x, fk, fg):
        """Per-half sublane shift down: new[wk] = old[wk-1], entering row 0
        of each half = fill * its old row 0."""
        return jnp.concatenate(
            [fk * x[:1], x[:W - 1], fg * x[W:W + 1], x[W:2 * W - 1]], axis=0
        )

    def kshift_up(x, fill):  # (W, L): new[wk] = old[wk+1], clamp last row
        return jnp.concatenate([x[1:], fill * x[-1:]], axis=0)

    def lshift_dn(x, fill):  # (W, L): new[wl] = old[wl-1] in-block, clamp low
        r = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        return jnp.where((wl == 0)[None, :], fill * x, r)

    # ---- state re-anchoring (staircase window algebra, full_stem.py) ----
    t = roll_i(KG1[...])
    KG1b = t + dkf * (kshift2(t, 1.0, g) - t)
    x0 = KG0[...]
    r = jnp.concatenate([x0[:, 1:], x0[:, -1:]], axis=1)  # l+1 read in-block
    edgef = (wl == W - 1).astype(f32)[None, :]
    shifted0 = r + edgef * (cg * x0 - r)
    KG0b = x0 + djf * (shifted0 - x0)
    t = roll_i(G0pp[...])
    tk = kshift_up(t, 1.0)
    base = tk + dkf * (t - tk)  # dk=1 keeps the unshifted block
    t2 = lshift_dn(base, 1.0)
    base = t2 + djf * (base - t2)

    # ---- bp_y window: block shift absorbs the l-advance; conditional
    # k-shift with the entering low-k row streamed in ----
    t = roll_i(BW[...])
    ts = jnp.concatenate([egk[None, :], t[:-1]], axis=0)
    BW[...] = t + dkf * (ts - t)

    # ---- injections, stacked (2W, L) ----
    eq1 = eq1_ref[0, ...]  # (W, L): x[i] == y[k]
    both = eq1 * e2[None, :]
    wfac = bpx[None, :] * BW[...]
    # both is a {0,1} product, so the subst selector is affine in it; the
    # wfac indicator is sign() (wfac >= 0 by construction)
    injk = base * f32(stack) * wfac * (f32(subst) + both * f32(1.0 - subst))
    injg = base * both * jnp.sign(wfac)
    inj = jnp.concatenate([injk, injg], axis=0)
    tri = (wkm <= off[None, :] + wl[None, :]).astype(f32)
    inj = inj * tri

    # ---- C1 (reverse cumsum over k): ONE block-diagonal MXU matmul ----
    iw = jax.lax.broadcasted_iota(jnp.int32, (2 * W, 2 * W), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (2 * W, 2 * W), 1)
    same_half = (iw < W) == (jw < W)
    iwm = jnp.where(iw >= W, iw - W, iw)
    jwm = jnp.where(jw >= W, jw - W, jw)
    U2 = jnp.where(
        same_half & (iwm <= jwm),
        jnp.where(iw < W, 1.0, jnp.exp((jwm - iwm).astype(f32) * lng)),
        0.0,
    )
    KG3 = jnp.dot(U2, inj, preferred_element_type=f32)

    # ---- C2 (in-window cumsum over l): combined lane doubling scan.
    # Block-boundary gating is a mask MULTIPLY (row-broadcast), not a
    # select: pure arithmetic chains flow through vregs (~0.65 us/op
    # measured) where selects materialize (~1.9 us) — see BASELINE.md ----
    x = KG3
    s = 1
    while s < W:
        sh = jnp.concatenate([jnp.zeros((2 * W, s), f32), x[:, :-s]], axis=1)
        cs = jnp.where(wk2[:, :1] >= W, f32(gap ** s), f32(1.0))
        mrow = (wl >= s).astype(f32)[None, :]
        x = x + cs * (sh * mrow)
        s *= 2
    KG2 = x

    KG1n = KG1b * cg + KG2
    KG0n = KG0b * cg + KG1n

    # ---- boundary overrides on the absolute diagonal k == l ----
    d = (d_idx + 1).astype(f32)
    s_inv = jnp.exp(-logS[0, 0])
    gd = jnp.exp(d * lng)
    diagf = ((wkm - wl[None, :]) == off[None, :]).astype(f32)
    seed = jnp.where(wk2[:, :1] < W, s_inv, gd * s_inv)  # (2W, 1)
    KG0n = KG0n * (tri * (1.0 - diagf)) + seed * diagf
    KG1n = KG1n * (tri * (1.0 - diagf))

    # ---- emit log K(0, d, 0, a(d)) for this level, one per ganged pair
    # (pair p occupies lanes [p*NB*W, (p+1)*NB*W); its block-0 window
    # center is the static lane p*NB*W + W//2) ----
    vs = [
        KG0n[W // 2:W // 2 + 1,
             pq * NB * W + W // 2: pq * NB * W + W // 2 + 1]
        for pq in range(G)
    ]
    v = jnp.concatenate(vs, axis=1) if G > 1 else vs[0]
    out_ref[...] = (
        jnp.where(v > 0, jnp.log(jnp.maximum(v, 1e-38)), -jnp.inf) + logS[0, 0]
    ).reshape(1, 1, 1, G)

    # ---- commit state; rescale every RESCALE_EVERY levels ----
    G0pp[...] = KG0[W:, :]
    KG0[...] = KG0n
    KG1[...] = KG1n

    @pl.when(d_idx % RESCALE_EVERY == RESCALE_EVERY - 1)
    def _rescale():
        m = jnp.maximum(jnp.max(jnp.abs(KG0[:W, :])), 1e-30)
        inv = 1.0 / m
        KG0[...] = KG0[...] * inv
        KG1[...] = KG1[...] * inv
        G0pp[...] = G0pp[...] * inv
        logS[0, 0] = logS[0, 0] + jnp.log(m)


@functools.partial(jax.jit, static_argnames=(
    "band", "gap", "stack", "subst", "interpret", "ali_bound", "gang"))
def _pallas_banded(x_codes, y_codes, lx, ly, bp_x, bp_y,
                   gap: float, stack: float, subst: float,
                   band: int, interpret: bool, ali_bound: float = 0.0,
                   gang: int = 1):
    from ..models.full_stem import (
        _banded_precompute, _pad_pair_to_common, phmm_anchor,
    )

    x_codes, y_codes, bp_x, bp_y = _pad_pair_to_common(
        x_codes, y_codes, bp_x, bp_y)
    bsz, n = x_codes.shape
    W = 2 * band + 1
    NB = n + 1
    L = NB * W

    # pairs swapped so lx >= ly (staircase deltas in {0, 1}; kernel symmetric)
    swap = ly > lx
    x_codes, y_codes = (
        jnp.where(swap[:, None], y_codes, x_codes),
        jnp.where(swap[:, None], x_codes, y_codes),
    )
    bp_x, bp_y = (
        jnp.where(swap[:, None, None], bp_y, bp_x),
        jnp.where(swap[:, None, None], bp_x, bp_y),
    )
    lx, ly = jnp.where(swap, ly, lx), jnp.where(swap, lx, ly)

    anchor = None
    if ali_bound > 0.0:
        anchor = phmm_anchor(x_codes, lx, y_codes, ly, ali_bound)
    (a, a_pad, dk_pad, eq1_win, E2pad, SXT, _, BW0) = _banded_precompute(
        x_codes, y_codes, lx, ly, bp_x, bp_y, band, with_eg=False,
        anchor=anchor
    )
    f32 = jnp.float32
    i_idx = jnp.arange(NB)
    d_lvl = jnp.arange(1, n + 1)

    # ---- expand per-level ingredients to the kernel's lane layout ----
    idx_id = d_lvl[:, None] + i_idx[None, :]             # (n, NB): i + d
    def at_ipd(v):  # v (B, 2n+1) -> (B, n, NB): v[i + d]
        return jnp.take_along_axis(
            v, jnp.broadcast_to(idx_id.reshape(1, -1), (bsz, n * NB)), 1
        ).reshape(bsz, n, NB)

    off_all = at_ipd(a_pad) - a[:, None, :]              # a[i+d] - a[i]
    dj_all = at_ipd(jnp.concatenate(
        [jnp.zeros((bsz, 1), jnp.int32), dk_pad[:, :-1]], 1))  # dk[i+d-1]
    bpx_all = jnp.swapaxes(SXT, 1, 2)[:, :, 1:]          # (B, NB, n) -> take d cols
    bpx_all = jnp.moveaxis(bpx_all, 2, 1)                # (B, n, NB)

    def lane_rep(v):  # (B, n, NB) -> (B, n, 1, NB*W): repeat per-block over W
        return jnp.broadcast_to(
            v[:, :, :, None], (bsz, n, NB, W)
        ).reshape(bsz, n, 1, L)

    off_s = lane_rep(off_all.astype(f32))
    dj_s = lane_rep(dj_all.astype(f32))
    bpx_s = lane_rep(bpx_all.astype(f32))

    # e2 stream: E2[i+d-1, wl] — Hankel of E2pad rows, built as n contiguous
    # row-window slices (big-slice gathers; a flat 24M-element gather here
    # measured ~200 ms/batch on the chip, dominating the kernel itself)
    e2_rows = jnp.moveaxis(
        jax.vmap(
            lambda d: jax.lax.dynamic_slice(E2pad, (0, d, 0), (bsz, NB, W))
        )(jnp.arange(n)),
        0, 1,
    ).reshape(bsz, n, 1, L).astype(f32)

    # entering low-k bp_y row: egk[b,d,i,wl] = bp_y[a(i)-band, a(i+d)-1-band+wl].
    # The column offset a(i+d)-a(i) takes exactly two values {floor(sd),
    # floor(sd)+1} across i (staircase window sums), so the irregular gather
    # becomes: per-block row gather -> per-(b,d) contiguous (W+1)-slice at the
    # minimum offset -> elementwise select between the two shifted views.
    r_egk = a - band                                      # (B, NB)
    r_ok = (r_egk >= 0)
    rows_e = jnp.take_along_axis(
        bp_y, jnp.clip(r_egk, 0, n - 1)[:, :, None], axis=1
    ) * r_ok[:, :, None]                                  # (B, NB, n): bp_y rows
    w_idx = jnp.arange(W)
    if ali_bound > 0.0:
        # PHMM anchors: the per-level offset spread off(i,d) - min_i off(i,d)
        # is UNBOUNDED (an indel detours the staircase), so the two-candidate
        # slice trick below is invalid — use the exact per-element gather
        # (slower precompute; the -a path pays it)
        a_at = at_ipd(a_pad)                              # (B, n, NB): a[i+d]
        c_egk = a_at[:, :, :, None] - 1 - band + w_idx[None, None, None, :]
        c_ok = (c_egk >= 0) & (c_egk < ly[:, None, None, None])
        flat = (jnp.clip(r_egk, 0, n - 1)[:, None, :, None] * n
                + jnp.clip(c_egk, 0, n - 1))
        egk_s = jnp.where(
            c_ok & r_ok[:, None, :, None],
            jnp.take_along_axis(
                bp_y.reshape(bsz, -1), flat.reshape(bsz, -1), 1
            ).reshape(bsz, n, NB, W),
            0.0,
        ).reshape(bsz, n, 1, L).astype(f32)
    else:
        # skew each row by its block anchor: SKE[b, i, c] = rows_e[b, i, a(i)+c-(band+1)]
        # (a small ~1M-element gather; the big one is now contiguous slices)
        C = n + 2 * W + 4
        cidx = a[:, :, None] + jnp.arange(C)[None, None, :] - (band + 1)
        # mask with the TRUE length ly (not just the pad width n) so a caller
        # passing a bp_y with nonzero entries beyond (ly, ly) cannot diverge
        # from the XLA path's EG masking (models/full_stem.py), which clips
        # at c < ly
        SKE = jnp.where(
            (cidx >= 0) & (cidx < ly[:, None, None]),
            jnp.take_along_axis(rows_e, jnp.clip(cidx, 0, n - 1), axis=2),
            0.0,
        )                                                     # (B, NB, C)
        # two-candidate structure holds only over VALID blocks (i + d <= lx);
        # clamped tail blocks drive off to 0 but are masked downstream anyway
        valid_blk = (i_idx[None, None, :] + d_lvl[None, :, None]
                     <= lx[:, None, None])                    # (B, n, NB)
        omin = jnp.where(valid_blk, off_all, jnp.int32(2 ** 30)).min(axis=2)
        omin = jnp.minimum(omin, ly[:, None])                 # all-invalid guard
        cand = jax.vmap(                                      # (B, n, NB, W+1)
            jax.vmap(
                lambda rp, c: jax.lax.dynamic_slice(
                    rp, (jnp.zeros((), c.dtype), c), (NB, W + 1)),
                in_axes=(None, 0),
            ),
            in_axes=(0, 0),
        )(SKE, jnp.clip(omin, 0, C - W - 1).astype(jnp.int32))
        sel = (off_all - omin[:, :, None])[:, :, :, None]     # 0 or 1
        egk_s = jnp.where(
            sel == 0, cand[:, :, :, :W], cand[:, :, :, 1:W + 1]
        ).reshape(bsz, n, 1, L).astype(f32)

    # resident rows / planes
    dk_row = jnp.broadcast_to(
        dk_pad[:, :NB, None].astype(f32), (bsz, NB, W)
    ).reshape(bsz, 1, L)
    wl_row = jnp.broadcast_to(
        (jnp.arange(L) % W).astype(f32)[None, None, :], (1, 1, L)
    )
    eq1_plane = jnp.broadcast_to(
        jnp.swapaxes(eq1_win, 1, 2)[:, :, :, None], (bsz, W, NB, W)
    ).reshape(bsz, W, L).astype(f32)
    bw0_plane = jnp.swapaxes(BW0, 1, 2).reshape(bsz, W, L).astype(f32)

    # ---- optional pair-ganging along the lane axis (round-5 experiment,
    # MEASURED NEGATIVE on the v5e at the n=300 bench point — see
    # full_stem_banded_pallas_log's docstring; default G = 1 is the
    # shipped fast path).  Cross-pair leakage of the W-lane block roll
    # only enters each pair's block NB-1 = n, which is invalid at every
    # level d >= 1; emitted values read only valid blocks.  The rescale
    # log-scale is shared per gang (a uniform lane multiply — exact). ----
    G = max(1, gang)
    pad_b = (-bsz) % G
    if pad_b:
        def padb(x):
            return jnp.pad(x, ((0, pad_b),) + ((0, 0),) * (x.ndim - 1))
        bpx_s, off_s, dj_s, e2_rows, egk_s, dk_row, eq1_plane, bw0_plane = (
            padb(v) for v in (bpx_s, off_s, dj_s, e2_rows, egk_s, dk_row,
                              eq1_plane, bw0_plane))
    bg = (bsz + pad_b) // G
    LG = G * L
    if G > 1:
        def g4(x):  # (B, n, 1, L) -> (B/G, n, 1, G*L)
            return x.reshape(bg, G, n, 1, L).transpose(0, 2, 3, 1, 4) \
                    .reshape(bg, n, 1, LG)

        def g3(x):  # (B, R, L) -> (B/G, R, G*L)
            r = x.shape[1]
            return x.reshape(bg, G, r, L).transpose(0, 2, 1, 3) \
                    .reshape(bg, r, LG)

        bpx_s, off_s, dj_s, e2_rows, egk_s = (
            g4(v) for v in (bpx_s, off_s, dj_s, e2_rows, egk_s))
        dk_row, eq1_plane, bw0_plane = (
            g3(v) for v in (dk_row, eq1_plane, bw0_plane))
        wl_row = jnp.broadcast_to(
            (jnp.arange(LG) % W).astype(f32)[None, None, :], (1, 1, LG))

    grid = (bg, n)
    kern = functools.partial(
        _kernel, float(gap), float(stack), float(subst), W, NB, G)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, LG), lambda b, s: (b, s, 0, 0)),  # bpx
            pl.BlockSpec((1, 1, 1, LG), lambda b, s: (b, s, 0, 0)),  # off
            pl.BlockSpec((1, 1, 1, LG), lambda b, s: (b, s, 0, 0)),  # dj
            pl.BlockSpec((1, 1, 1, LG), lambda b, s: (b, s, 0, 0)),  # e2
            pl.BlockSpec((1, 1, 1, LG), lambda b, s: (b, s, 0, 0)),  # egk
            pl.BlockSpec((1, 1, LG), lambda b, s: (b, 0, 0)),        # dk row
            pl.BlockSpec((1, 1, LG), lambda b, s: (0, 0, 0)),        # wl row
            pl.BlockSpec((1, W, LG), lambda b, s: (b, 0, 0)),        # eq1 plane
            pl.BlockSpec((1, W, LG), lambda b, s: (b, 0, 0)),        # BW0 plane
        ],
        out_specs=pl.BlockSpec((1, 1, 1, G), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bg, n, 1, G), f32),
        scratch_shapes=[pltpu.VMEM((2 * W, LG), f32), pltpu.VMEM((2 * W, LG), f32),
                        pltpu.VMEM((W, LG), f32), pltpu.VMEM((W, LG), f32),
                        pltpu.SMEM((1, 1), f32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bpx_s, off_s, dj_s, e2_rows, egk_s, dk_row, wl_row, eq1_plane, bw0_plane)

    # outs (bg, n, 1, G): pair p of group b sits at [..., p]
    per_pair = outs.reshape(bg, n, G).transpose(0, 2, 1).reshape(bg * G, n)[:bsz]
    vals = per_pair[jnp.arange(bsz), jnp.clip(lx - 1, 0, n - 1)]
    return jnp.where(lx == 0, 0.0, vals)


def full_stem_banded_pallas_log(
    x_codes, y_codes, lx, ly, bp_x, bp_y,
    gap: float, stack: float, subst: float,
    band: int = 16, interpret: bool | None = None,
    ali_bound: float = 0.0, gang: int | None = None,
):
    """log K of the banded full stem kernel, VMEM-resident Pallas path.

    Same semantics as models.full_stem.full_stem_kernel_banded_log (scaled
    staircase-anchor windows, pair auto-swap, log output) with gap/stack/
    subst STATIC (they fold into scan constants).  ``interpret`` defaults to
    True off-TPU so tests exercise the kernel on CPU.

    ``gang``: pairs packed side by side along the lane axis of one grid
    step.  Default 1 — MEASURED NEGATIVE on the v5e (BASELINE.md round 5):
    per-step cost grows superlinearly with lane width (G=2 at n=300 is
    slower per pair than G=1, and even at matched total lanes the ganged
    layout costs ~50% more per step), so the hoped-for fixed-cost
    amortization never materializes.  Kept for experimentation on other
    TPU generations; correctness is covered by the interpret-mode property
    tests, which exercise G = min(4, batch).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    if gang is None:
        gang = 1
    return _pallas_banded(
        x_codes, y_codes,
        jnp.asarray(lx, jnp.int32), jnp.asarray(ly, jnp.int32),
        jnp.asarray(bp_x, jnp.float32), jnp.asarray(bp_y, jnp.float32),
        float(gap), float(stack), float(subst), int(band), bool(interpret),
        float(ali_bound), int(gang),
    )
