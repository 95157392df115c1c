"""The full O(n^2 m^2) stem kernel (the reference implementation's kernel).

TPU redesign of /root/reference/stem_kernel/stem_kernel.cpp:83-351: the
8-state DP (K0-K3/G0-G3) over pairs of substrings (i,j) x (k,l).  The
reference walks a 4-index loop nest with lazily allocated per-(i,j) tables;
here the DP is a `lax.scan` over x-span length d with everything else
vectorized:

- level d holds all blocks (i, i+d) as one (B, n+1, m+1, m+1) tensor per
  state; a block depends only on levels d-1 ((i, j-1) and (i+1, j)) and d-2
  (G0 of (i+1, j-1)) — an anti-diagonal wavefront over x-spans;
- within a block the reference's k-descending / l-ascending sweeps are
  first-order recurrences:
      K3(k,l) = K3(k+1,l) + inj(k,l)          reverse cumsum over k
      G3(k,l) = g*G3(k+1,l) + injG(k,l)       reverse linear recurrence
      K2(k,l) = K2(k,l-1) + K3(k,l)           cumsum over l
      G2(k,l) = g*G2(k,l-1) + G3(k,l)         linear recurrence over l
      K1/G1, K0/G0: elementwise adds from the d-1 level (dp_init/dp_update,
      stem_kernel.cpp:85-111);
- the match injection (stem_kernel.cpp:293-326):
      pairable(i,j-1) & pairable(k,l-1):
        equal end bases:  K3 += G0_{d-2}(i+1)(k+1,l-1)*stack*bp_ij*bp_kl
                          G3 += G0_{d-2}(i+1)(k+1,l-1)
        else:             K3 += G0_{d-2}(i+1)(k+1,l-1)*stack*subst*bp_ij*bp_kl
- banding (partial_dp's c_low/c_high windows) masks the match injection
  outside per-i column windows; the reference's out-of-band boundary
  approximations (stem_kernel.cpp:165-246) trade accuracy for memory, which
  the dense formulation does not need.

Base-pair predicates mirror stem_kernel.cpp:353-421: Normal (Watson-Crick),
Wobble (+GU), or a supplied BPP matrix with probability bound.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.alphabet import RNA_A, RNA_C, RNA_G, RNA_U
from ..ops.recurrence import linear_recurrence


def pair_weights(
    codes: np.ndarray,
    length: int,
    *,
    use_GU: bool = True,
    min_loop: int = 3,
    bpp: np.ndarray | None = None,
    bp_bound: float = 0.0,
) -> np.ndarray:
    """(n, n) pair weight matrix w[i, j] for closing positions (i, j).

    Predicate variants give weight 1 to allowed pairs (NormalBasePair /
    WobbleBasePair, stem_kernel.cpp:353-390); with a BPP matrix the weight is
    the probability, zeroed below ``bp_bound`` (Vienna-backed BPMatrix,
    :392-421).  Pairs must enclose at least ``min_loop`` unpaired bases.
    """
    n = len(codes)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    if bpp is not None:
        w = np.where(bpp > bp_bound, bpp, 0.0)
    else:
        a, b = codes[ii], codes[jj]
        wc = ((a == RNA_A) & (b == RNA_U)) | ((a == RNA_U) & (b == RNA_A)) | (
            (a == RNA_C) & (b == RNA_G)
        ) | ((a == RNA_G) & (b == RNA_C))
        if use_GU:
            wc |= ((a == RNA_G) & (b == RNA_U)) | ((a == RNA_U) & (b == RNA_G))
        w = wc.astype(np.float64)
    w = np.where(jj - ii > min_loop, w, 0.0)
    w = np.where((ii < length) & (jj < length), w, 0.0)
    return w


@partial(jax.jit, static_argnames=("band",))
def full_stem_kernel(
    x_codes: jax.Array,  # (B, n)
    y_codes: jax.Array,  # (B, m)
    lx: jax.Array,
    ly: jax.Array,
    bp_x: jax.Array,  # (B, n, n) pair weights
    bp_y: jax.Array,  # (B, m, m)
    gap: jax.Array,
    stack: jax.Array,
    subst: jax.Array,
    band: int = 0,
    win_lo: jax.Array | None = None,  # (B, n+1) per-position y-window lows
    win_hi: jax.Array | None = None,  # (B, n+1) y-window highs
) -> jax.Array:
    """Batched full stem kernel values (B,).

    ``band > 0`` restricts match injections to per-position diagonal
    windows: y-start k within +-band of x-start i's diagonal image and
    y-end l within +-band of the x-end j's — the band-only variant of
    alignment_constraints (stem_kernel.cpp:70-76).  NOTE: the reference's
    partial_dp also *approximates* out-of-window table reads
    (stem_kernel.cpp:165-246) to save memory; the dense formulation keeps
    everything else exact, so banded values are a tighter approximation
    than the reference's.
    """
    bsz, n = x_codes.shape
    m = y_codes.shape[1]
    dt = bp_x.dtype
    gap = jnp.asarray(gap, dt)
    stack = jnp.asarray(stack, dt)
    subst = jnp.asarray(subst, dt)

    k_idx = jnp.arange(m + 1)
    l_idx = jnp.arange(m + 1)
    low_tri = (k_idx[:, None] <= l_idx[None, :]).astype(dt)  # valid k <= l
    diag_kl = (k_idx[:, None] == l_idx[None, :]).astype(dt)

    eq = (x_codes[:, :, None] == y_codes[:, None, :])  # (B, n, m)

    # level d = 0: K0 = 1 everywhere, G0(k,l) = g^(l-k) on k <= l
    gpow = gap ** (l_idx[None, :] - k_idx[:, None]).astype(dt)
    K0_0 = jnp.ones((bsz, n + 1, m + 1, m + 1), dt)
    G0_0 = jnp.broadcast_to((gpow * low_tri)[None, None], (bsz, n + 1, m + 1, m + 1)).astype(dt)
    zeros = jnp.zeros((bsz, n + 1, m + 1, m + 1), dt)

    def shift_i(t):  # value at start i+1 (block to the "lower-left")
        return jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], axis=1)

    def level_step(carry, d):
        (K0p, G0p, K1p, G1p, G0pp) = carry
        # gather ingredients
        K1_base = shift_i(K1p)  # K1(i+1, j) level d-1
        G1_base = shift_i(G1p)
        K0_base = K0p  # K0(i, j-1) level d-1 (same start index)
        G0_base = G0p
        G0_inner = shift_i(G0pp)  # G0(i+1, j-1) level d-2

        # match injection over (B, i, k, l)
        i_idx = jnp.arange(n + 1)
        jm1 = jnp.clip(i_idx + d - 1, 0, n - 1)  # j-1 per start i
        valid_i = (i_idx + d <= n)
        # bp_x(i, j-1) per start i
        bpx_d = jnp.where(
            valid_i[None, :], bp_x[:, jnp.minimum(i_idx, n - 1), jm1], 0.0
        )  # (B, n+1)
        # eq1[i, k] = x[i] == y[k]; eq2[i, l] = x[j-1] == y[l-1]
        eq1 = eq[:, jnp.minimum(i_idx, n - 1), :]  # (B, n+1, m)
        eq2 = eq[:, jm1, :]  # (B, n+1, m) indexed by l-1
        # G0_inner at (k+1, l-1): shift k down, l up
        base = G0_inner[:, :, 1:, :]  # k+1
        base = jnp.concatenate([base, jnp.zeros_like(base[:, :, :1])], axis=2)
        base = jnp.concatenate([jnp.zeros_like(base[..., :1]), base[..., :-1]], axis=3)  # l-1
        # bp_y(k, l-1): (B, m+1, m+1)
        bpy_kl = jnp.pad(bp_y, ((0, 0), (0, 1), (1, 0)))
        both_eq = (
            jnp.pad(eq1, ((0, 0), (0, 0), (0, 1)))[:, :, :, None]
            * jnp.pad(eq2, ((0, 0), (0, 0), (1, 0)))[:, :, None, :]
        )
        wfac = bpx_d[:, :, None, None] * bpy_kl[:, None, :, :]
        inj_k3 = base * stack * wfac * jnp.where(both_eq > 0, 1.0, subst)
        inj_g3 = base * both_eq * jnp.where(wfac > 0, 1.0, 0.0)
        if band > 0:
            # per-position diagonal windows: k near image of i, l near image of j
            kl = jnp.arange(m + 1)
            ci = jnp.round(i_idx[None, :] / jnp.maximum(lx[:, None], 1) * ly[:, None])
            cj = jnp.round(jnp.minimum(i_idx[None, :] + d, n) / jnp.maximum(lx[:, None], 1) * ly[:, None])
            k_ok = jnp.abs(kl[None, None, :] - ci[:, :, None]) <= band
            l_ok = jnp.abs(kl[None, None, :] - cj[:, :, None]) <= band
            bm = (k_ok[:, :, :, None] & l_ok[:, :, None, :]).astype(dt)
            inj_k3 = inj_k3 * bm
            inj_g3 = inj_g3 * bm
        if win_lo is not None:
            # pair-HMM alignment windows (partial_dp's c_low/c_high,
            # stem_kernel.cpp:165-246): k in the window of start i, l in
            # the window of end j = i + d
            kl = jnp.arange(m + 1)
            j_at = jnp.minimum(i_idx[None, :] + d, n)  # (1, n+1)
            lo_i = win_lo[:, :]                        # (B, n+1) at i
            hi_i = win_hi[:, :]
            lo_j = jnp.take_along_axis(win_lo, jnp.broadcast_to(j_at, win_lo.shape), 1)
            hi_j = jnp.take_along_axis(win_hi, jnp.broadcast_to(j_at, win_hi.shape), 1)
            k_ok = (kl[None, None, :] >= lo_i[:, :, None]) & (kl[None, None, :] <= hi_i[:, :, None])
            l_ok = (kl[None, None, :] >= lo_j[:, :, None]) & (kl[None, None, :] <= hi_j[:, :, None])
            wm = (k_ok[:, :, :, None] & l_ok[:, :, None, :]).astype(dt)
            inj_k3 = inj_k3 * wm
            inj_g3 = inj_g3 * wm
        # zero out k > l-? and out-of-range blocks
        mask_kl = low_tri[None, None]
        inj_k3 = inj_k3 * mask_kl * valid_i[None, :, None, None]
        inj_g3 = inj_g3 * mask_kl * valid_i[None, :, None, None]

        # within-block recursions
        # K3: reverse cumsum over k; G3: reverse linear recurrence (decay g)
        K3 = jnp.cumsum(inj_k3[:, :, ::-1, :], axis=2)[:, :, ::-1, :]
        G3 = jnp.swapaxes(
            linear_recurrence(
                gap, jnp.swapaxes(inj_g3, 2, 3), reverse=True
            ),
            2,
            3,
        )
        # K2: cumsum over l; G2: linear recurrence over l (decay g)
        K2 = jnp.cumsum(K3, axis=3)
        G2 = linear_recurrence(gap, G3)
        K1 = K1_base + K2
        G1 = G1_base * gap + G2
        K0 = K0_base + K1
        G0 = G0_base * gap + G1
        # boundary overrides on the (l, l) diagonal and upper triangle
        K0 = K0 * low_tri + (1.0 - low_tri) * 0.0
        K0 = jnp.where(diag_kl[None, None] > 0, 1.0, K0)
        G0 = G0 * low_tri
        G0 = jnp.where(diag_kl[None, None] > 0, gap ** jnp.asarray(d, dt), G0)
        K1 = K1 * low_tri * (1.0 - diag_kl)
        G1 = G1 * low_tri * (1.0 - diag_kl)

        out = K0[:, 0, 0, :]  # value row for spans (0, d): K0(0, d, 0, l)
        return (K0, G0, K1, G1, G0p), out

    init = (K0_0, G0_0, zeros, zeros, zeros)
    _, outs = jax.lax.scan(level_step, init, jnp.arange(1, n + 1))
    # outs: (n, B, m+1); pick level lx, column ly
    outs = jnp.concatenate([K0_0[None, :, 0, 0, :], outs], axis=0)  # level 0..n
    return outs[lx, jnp.arange(bsz), ly]


@partial(jax.jit, static_argnames=("band",))
def full_stem_kernel_banded(
    x_codes: jax.Array,  # (B, n)
    y_codes: jax.Array,  # (B, m)
    lx: jax.Array,
    ly: jax.Array,
    bp_x: jax.Array,  # (B, n, n)
    bp_y: jax.Array,  # (B, m, m)
    gap: jax.Array,
    stack: jax.Array,
    subst: jax.Array,
    band: int = 16,
) -> jax.Array:
    """Windowed-memory full stem kernel: O(B n W^2) live state, W = 2*band+1.

    The TPU equivalent of the reference's banded partial_dp with row
    recycling (/root/reference/stem_kernel/stem_kernel.cpp:165-246,
    stem_kernel/dptable.h:41-116): instead of five dense (B, n+1, m+1, m+1)
    state tensors, each block (i, j=i+d) stores only a (W, W) window of the
    (k, l) plane anchored on the slope-1 diagonal (k in i +- band,
    l in j +- band).

    Window algebra (why this is EXACT inside the band, not an
    approximation): out-of-window state values have closed forms —
    * K-states are CONSTANT beyond the band (their k/l recursions are
      cumsums of injections that the band masks to zero), so a window
      shifted by one replicates its edge value (clamp fill);
    * G-states DECAY by exactly ``gap`` per step beyond the band (their
      recursions are linear recurrences with decay ``gap`` and zero
      injection), so the entering edge is gap * edge.
    Hence for equal-length pairs the banded kernel equals the dense
    ``full_stem_kernel(band=band)`` to floating-point accuracy.  For
    lx != ly the dense path anchors windows on the scaled diagonal
    (round(i*ly/lx)) while this path uses slope 1, so values agree when
    |lx - ly| <= band and diverge gracefully beyond (the same regime the
    reference's len_band gate excludes, stem_kernel_lite/stem_kernel.cpp:46-48).
    Pairs with |lx - ly| > band return 0.
    """
    bsz, n = x_codes.shape
    m = y_codes.shape[1]
    dt = bp_x.dtype
    gap = jnp.asarray(gap, dt)
    stack = jnp.asarray(stack, dt)
    subst = jnp.asarray(subst, dt)
    W = 2 * band + 1

    i_idx = jnp.arange(n + 1)
    wk_idx = jnp.arange(W)
    wl_idx = jnp.arange(W)

    eq = (x_codes[:, :, None] == y_codes[:, None, :])  # (B, n, m)

    # --- d-independent windows ---
    # absolute k for (block i, window slot wk): k = i - band + wk
    k_abs = i_idx[:, None] - band + wk_idx[None, :]  # (n+1, W)
    k_ok = (k_abs >= 0) & (k_abs <= m - 1)
    eq_i = eq[:, jnp.minimum(i_idx, n - 1), :]  # (B, n+1, m)
    kk = jnp.clip(k_abs, 0, m - 1)
    eq1_win = jnp.where(
        k_ok[None],
        jnp.take_along_axis(eq_i, jnp.broadcast_to(kk[None], (bsz, n + 1, W)), axis=2),
        False,
    )  # (B, n+1, W)

    # --- initial states: level d = 0, l anchor = k anchor = i ---
    rel = wl_idx[None, :] - wk_idx[:, None]  # l - k at d = 0
    G0_0 = jnp.broadcast_to(
        (gap ** rel.astype(dt)) * (rel >= 0).astype(dt), (bsz, n + 1, W, W)
    ).astype(dt)
    K0_0 = jnp.ones((bsz, n + 1, W, W), dt)
    zeros = jnp.zeros((bsz, n + 1, W, W), dt)

    # constant (W, W) contraction matrices for the within-window recursions:
    #   K3[a] = sum_{b >= a} inj[b]          (reverse cumsum)
    #   G3[a] = sum_{b >= a} g^(b-a) inj[b]  (reverse linear recurrence)
    #   K2[l] = sum_{a <= l} K3[a]           (cumsum)
    #   G2[l] = sum_{a <= l} g^(l-a) G3[a]
    rel_w = wk_idx[:, None] - wk_idx[None, :]  # a - b
    up_ones = (rel_w <= 0).astype(dt)
    up_gap = up_ones * gap ** jnp.maximum(-rel_w, 0).astype(dt)
    lo_ones = up_ones  # [a, l]: 1 where a <= l — same triangular pattern
    lo_gap = up_gap
    prec = jax.lax.Precision.HIGHEST

    def shift_i(t):  # block at start i+1
        return jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], axis=1)

    def shift_wk(t, fill_scale):
        """new[wk] = old[wk-1]; entering low-k edge = fill_scale * old[0]."""
        return jnp.concatenate(
            [fill_scale * t[:, :, :1], t[:, :, :-1]], axis=2
        )

    def shift_wl(t, fill_scale):
        """new[wl] = old[wl+1]; entering high-l edge = fill_scale * old[-1]."""
        return jnp.concatenate(
            [t[..., 1:], fill_scale * t[..., -1:]], axis=3
        )

    def level_step(carry, d):
        (K0p, G0p, K1p, G1p, G0pp) = carry
        # K1(i+1, j): block shift + k-window re-anchor (clamp / gap fills)
        K1_base = shift_wk(shift_i(K1p), 1.0)
        G1_base = shift_wk(shift_i(G1p), gap)
        # K0(i, j-1): l-window slides right by one
        K0_base = shift_wl(K0p, 1.0)
        G0_base = shift_wl(G0p, gap)
        # G0(i+1, j-1) read at (k+1, l-1): anchors cancel — plain block shift
        base = shift_i(G0pp)

        jm1 = jnp.clip(i_idx + d - 1, 0, n - 1)
        valid_i = (i_idx + d <= n)
        bpx_d = jnp.where(
            valid_i[None, :], bp_x[:, jnp.minimum(i_idx, n - 1), jm1], 0.0
        )  # (B, n+1)

        # absolute l = i + d - band + wl;   reads use l-1
        lm1 = i_idx[:, None] + d - band + wl_idx[None, :] - 1  # (n+1, W)
        l_ok = (lm1 >= 0) & (lm1 <= m - 1)
        ll = jnp.clip(lm1, 0, m - 1)
        eq2_full = eq[:, jm1, :]  # (B, n+1, m)
        eq2_win = jnp.where(
            l_ok[None],
            jnp.take_along_axis(
                eq2_full, jnp.broadcast_to(ll[None], (bsz, n + 1, W)), axis=2
            ),
            False,
        )
        # bp_y(k, l-1) window: (B, n+1, W, W)
        bpy_win = bp_y[:, kk[:, :, None], ll[:, None, :]]
        bpy_win = jnp.where(
            (k_ok[:, :, None] & l_ok[:, None, :])[None], bpy_win, 0.0
        )

        both_eq = (eq1_win[:, :, :, None] & eq2_win[:, :, None, :]).astype(dt)
        wfac = bpx_d[:, :, None, None] * bpy_win
        inj_k3 = base * stack * wfac * jnp.where(both_eq > 0, 1.0, subst)
        inj_g3 = base * both_eq * jnp.where(wfac > 0, 1.0, 0.0)

        # k <= l  <=>  wk <= d + wl;  out-of-range blocks contribute nothing
        tri_w = (wk_idx[:, None] <= d + wl_idx[None, :]).astype(dt)
        inj_k3 = inj_k3 * tri_w[None, None] * valid_i[None, :, None, None]
        inj_g3 = inj_g3 * tri_w[None, None] * valid_i[None, :, None, None]

        # within-window recursions (injections vanish outside the band, so
        # window sums equal the unbounded ones).  Expressed as (W, W)
        # triangular-matrix contractions rather than cumsum/associative_scan:
        # identical math, runs on the MXU, and avoids an XLA-TPU fusion-
        # emitter crash (TransformWindow CHECK) that the scan lowering
        # triggers at W >= 33 on these (B, n+1, W, W) shapes.
        K3 = jnp.einsum("ab,xnbl->xnal", up_ones, inj_k3, precision=prec)
        G3 = jnp.einsum("ab,xnbl->xnal", up_gap, inj_g3, precision=prec)
        K2 = jnp.einsum("xnka,al->xnkl", K3, lo_ones, precision=prec)
        G2 = jnp.einsum("xnka,al->xnkl", G3, lo_gap, precision=prec)
        K1 = K1_base + K2
        G1 = G1_base * gap + G2
        K0 = K0_base + K1
        G0 = G0_base * gap + G1

        # boundary overrides; the absolute diagonal k == l sits at
        # wk - wl == d (only inside the window while d < W)
        diag_w = (wk_idx[:, None] - wl_idx[None, :] == d).astype(dt)
        K0 = K0 * tri_w + (1.0 - tri_w) * 0.0
        K0 = jnp.where(diag_w[None, None] > 0, 1.0, K0)
        G0 = G0 * tri_w
        G0 = jnp.where(diag_w[None, None] > 0, gap ** jnp.asarray(d, dt), G0)
        K1 = K1 * tri_w * (1.0 - diag_w)
        G1 = G1 * tri_w * (1.0 - diag_w)

        out = K0[:, 0, band, :]  # block (0, d) at k = 0: (B, W) over l slots
        return (K0, G0, K1, G1, G0p), out

    init = (K0_0, G0_0, zeros, zeros, zeros)
    _, outs = jax.lax.scan(level_step, init, jnp.arange(1, n + 1))
    outs = jnp.concatenate([K0_0[None, :, 0, band, :], outs], axis=0)  # d = 0..n
    # value at (lx, l = ly): window slot band + (ly - lx); defined only
    # within the band
    off = ly - lx
    slot = jnp.clip(band + off, 0, W - 1)
    vals = outs[lx, jnp.arange(bsz), slot]
    return jnp.where(jnp.abs(off) <= band, vals, 0.0)
