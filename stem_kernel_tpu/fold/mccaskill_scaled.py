"""Scaled linear-domain McCaskill engine — the fast batched TPU path.

Same model and recursions as :mod:`.mccaskill` (the log-space oracle), but
designed for the machine instead of for numerical convenience:

- **linear (exp) domain with per-span rescaling**: every DP row (one span
  length d across all starts i) is renormalized to max 1.0 and its log scale
  accumulated in ``mu[d]`` — Vienna's global ``pf_scale``
  (/root/reference/common/bpmatrix.cpp:158-165) done exactly, per row, with
  no a-priori estimate needed.  All combining arithmetic is multiply/add.
- **zero gathers inside the scan**: the log engine's ``_span_gather``
  (clip+take) lowers to serial gathers that also explode compile time under
  vmap.  Here every read is a ``dynamic_slice`` out of a reversed row buffer
  (rows stored at ``n-1-d`` so "all spans below d" is one contiguous slab),
  a static shift, a small convolution, or a pad-reshape skew.
- **interior loops as a conv2d**: the (a, b) offset double sum becomes one
  (C+1, A+1) correlation kernel of exp(loop penalties) applied to the slab
  of Qb rows d-c — one ``lax.conv_general_dilated`` per step on the MXU.
- **multiloop split sums as slab reductions**: Qm2's split over t is an
  elementwise product of two aligned (n, n) slabs (start-layout Qm and
  end-layout Qm1 shifted by d) contracted over rows with per-row scale
  factors exp(mu[t-1] + mu[d-t] - p).
- **batching via vmap**: with no gathers, the whole batch compiles as one
  program; the per-example Python loop of the log engine disappears.

Scale-correct combining: a row computed at provisional scale p gets
contributions X̂·exp(mu_X - p); p is the max over all candidate offsets so
every factor is <= 1 (terms more than ~87 log units below the row's dominant
contribution underflow — standard partition-function practice; the exact
log-space engine remains as the oracle and fallback).

Outside pass mirrors the structure top-down (per-span offsets ``om[D]``)
with the same machinery plus pad-reshape skew sums for the split terms whose
shift varies with the summation index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import EnergyParams, default_params, hairpin_score, interior_score
from .mccaskill import _pair_tables, _span_gather, _PARAMS_REGISTRY, _register

NEG = -1e30
TINY = 1e-38


def _interior_kernel(params: EnergyParams) -> np.ndarray:
    """K2[c, a] = exp(interior/bulge penalty) for offsets a, b=c-a (else 0)."""
    cmax = params.max_interior + 2
    k = np.zeros((cmax + 1, cmax), dtype=np.float64)  # a in 1..cmax-1
    for a in range(1, cmax):
        for b in range(1, cmax):
            c = a + b
            if c > cmax or (a == 1 and b == 1):
                continue
            if (a - 1) + (b - 1) > params.max_interior:
                continue
            k[c, a] = np.exp(interior_score(params, a - 1, b - 1))
    return k


def _shift_left(v: jax.Array, k, width: int) -> jax.Array:
    """out[..., i] = v[..., i+k] with zero fill; k may be traced."""
    pad = jnp.zeros(v.shape[:-1] + (width,), v.dtype)
    vp = jnp.concatenate([v, pad], axis=-1)
    start = (0,) * (v.ndim - 1) + (k,)
    return jax.lax.dynamic_slice(vp, start, v.shape)


def _shift_right(v: jax.Array, k, width: int) -> jax.Array:
    """out[..., i] = v[..., i-k] with zero fill; k may be traced."""
    pad = jnp.zeros(v.shape[:-1] + (width,), v.dtype)
    vp = jnp.concatenate([pad, v], axis=-1)
    start = (0,) * (v.ndim - 1) + (width - k,)
    return jax.lax.dynamic_slice(vp, start, v.shape)


def _skew_sum(c: jax.Array) -> jax.Array:
    """sum_t C[t, i - t] over rows, via the pad-reshape diagonal trick.

    C: (m, n) -> out: (n,) with out[i] = sum_t C[t, i-t] (zero outside).
    """
    m, n = c.shape
    cp = jnp.pad(c, ((0, 0), (0, m)))  # (m, n + m)
    flat = cp.reshape(-1)[: m * (n + m - 1)]
    sk = flat.reshape(m, n + m - 1)  # sk[t, y] = C[t, y - t]
    return jnp.sum(sk, axis=0)[:n]


def _conv_rows(slab: jax.Array, kernel: jax.Array, flip: bool) -> jax.Array:
    """out[i] = sum_{c,a} slab[c, i + a] * K[c, a]   (flip=False)
       out[i] = sum_{c,a} slab[c, i - a] * K[c, a]   (flip=True)
    slab: (C, n), kernel: (C, A) -> out: (n,)."""
    cdim, n = slab.shape
    _, adim = kernel.shape
    if flip:
        x = jnp.pad(slab, ((0, 0), (adim - 1, 0)))[None, None]
        k = kernel[:, ::-1][None, None]
    else:
        x = jnp.pad(slab, ((0, 0), (0, adim - 1)))[None, None]
        k = kernel[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0, 0, :n]


@partial(jax.jit, static_argnums=(2,))
def _inside_scaled(codes, length, params_key, w_extra):
    """Scaled inside pass.  Returns span-layout scaled tables + offsets.

    Output: dict with Qb, Qm1, Qm, Qm2 (n, n) scaled rows; mu (n,) log
    offsets; ql (n+1,) log external prefixes; logZ scalar.
    """
    params = _PARAMS_REGISTRY[params_key]
    n = codes.shape[0]
    dt = jnp.float32

    wpair_log, stack_log = _pair_tables(codes, length, params, w_extra)
    i_idx = jnp.arange(n)
    dgrid = jnp.arange(n)[:, None]
    # span-layout linear tables (one gather each, outside the scan)
    wpairS = jnp.exp(
        jnp.minimum(_span_gather(wpair_log, i_idx[None, :], i_idx[None, :] + dgrid), 60.0)
    ).astype(dt)
    stackS = jnp.exp(
        jnp.minimum(_span_gather(stack_log, i_idx[None, :], i_idx[None, :] + dgrid), 60.0)
    ).astype(dt)

    hp_sizes = np.arange(n)
    hp_log_np = np.where(
        hp_sizes >= params.min_hairpin, hairpin_score(params, hp_sizes), NEG
    )
    hp_log = jnp.asarray(hp_log_np, dt)

    k2 = jnp.asarray(_interior_kernel(params), dt)  # (C+1, A)
    cdim = k2.shape[0]  # C + 1
    b_lin = jnp.float32(np.exp(params.ml_branch))
    c_lin = jnp.float32(np.exp(params.ml_unpaired))
    ab_lin = jnp.float32(np.exp(params.ml_close + params.ml_branch))
    cpow = jnp.asarray(
        np.exp(params.ml_unpaired * np.arange(n, dtype=np.float64)), dt
    )

    zrow = jnp.zeros((n,), dt)
    nrev = n + max(n, cdim) + 1  # rev buffers must fit (start, cdim|n) slices
    carry = dict(
        rqb=jnp.zeros((nrev, n), dt),            # rev span Qb rows at n-1-d
        rqm1e=jnp.zeros((nrev, n), dt),          # rev end-layout Qm1 rows
        qm_tbl=jnp.zeros((n, n), dt),            # start-layout Qm rows
        mu=jnp.full((n,), NEG, dt),
        mu_rev=jnp.full((nrev,), NEG, dt),
        qm1_prev=zrow,
        qm2_prev=zrow,
        qm2_prev2=zrow,
    )

    def step(carry, d):
        start = n - 1 - d
        t_slab = jax.lax.dynamic_slice(carry["rqb"], (start, 0), (cdim, n))
        mu_t = jax.lax.dynamic_slice(carry["mu_rev"], (start,), (cdim,))
        s_slab = jax.lax.dynamic_slice(carry["rqm1e"], (start, 0), (n, n))
        mu_s = jax.lax.dynamic_slice(carry["mu_rev"], (start,), (n,))
        mu_sh = jnp.concatenate([jnp.full((1,), NEG, dt), carry["mu"][:-1]])

        hp_d = hp_log[jnp.clip(d - 1, 0, n - 1)]
        p = jnp.maximum(jnp.max(mu_sh + mu_s), jnp.maximum(jnp.max(mu_s), hp_d))
        p = jnp.where(p < -1e29, jnp.float32(0.0), p)

        f_t = jnp.exp(mu_t - p)  # (cdim,)
        f_s = jnp.exp(mu_s - p)  # (n,)
        f_w = jnp.exp(mu_sh + mu_s - p)  # (n,)

        # ---- Qb row ----
        tf = t_slab * f_t[:, None]
        hp_term = jnp.exp(hp_d - p)
        stack_row = jax.lax.dynamic_slice(stackS, (d, 0), (1, n))[0]
        stack_term = stack_row * _shift_left(tf[2], 1, 1)
        int_term = _conv_rows(tf, k2, flip=False)
        close_term = ab_lin * _shift_left(
            carry["qm2_prev2"] * f_t[2], 1, 1
        )
        wp_row = jax.lax.dynamic_slice(wpairS, (d, 0), (1, n))[0]
        qb = wp_row * (hp_term + stack_term + int_term + close_term)

        # ---- Qm1 row ----
        qm1 = c_lin * carry["qm1_prev"] * f_s[1] + b_lin * qb

        # ---- split slabs ----
        u_slab = _shift_left(s_slab, d, n)  # row t: Qm1E[d-t] at position i+d
        u_slab = u_slab.at[0].set(qm1)      # t = 0: fresh row (already at p)
        w_sh = jnp.concatenate(
            [jnp.zeros((1, n), dt), carry["qm_tbl"][:-1]], axis=0
        )  # row t = Qm[t-1]
        qm2 = jnp.sum(w_sh * u_slab * f_w[:, None], axis=0)
        f_unp = (cpow * f_s).at[0].set(1.0)
        qm = qm2 + jnp.sum(u_slab * f_unp[:, None], axis=0)

        # keep junk in invalid lanes (i + d >= length) out of the row scale
        valid = (i_idx + d < length).astype(dt)
        qb, qm1, qm, qm2 = qb * valid, qm1 * valid, qm * valid, qm2 * valid

        # ---- joint rescale ----
        m = jnp.max(
            jnp.maximum(jnp.maximum(jnp.max(qb), jnp.max(qm1)),
                        jnp.maximum(jnp.max(qm), jnp.max(qm2)))
        )
        scale = jnp.where(m > 0, m, jnp.float32(1.0))
        inv = 1.0 / scale
        qb, qm1, qm, qm2 = qb * inv, qm1 * inv, qm * inv, qm2 * inv
        mu_d = jnp.where(m > 0, p + jnp.log(scale), jnp.float32(NEG))

        qm1e = _shift_right(qm1, d, n)
        carry = dict(
            rqb=jax.lax.dynamic_update_slice(carry["rqb"], qb[None], (start, 0)),
            rqm1e=jax.lax.dynamic_update_slice(
                carry["rqm1e"], qm1e[None], (start, 0)
            ),
            qm_tbl=jax.lax.dynamic_update_slice(
                carry["qm_tbl"], qm[None], (d, 0)
            ),
            mu=jax.lax.dynamic_update_slice(carry["mu"], mu_d[None], (d,)),
            mu_rev=jax.lax.dynamic_update_slice(
                carry["mu_rev"], mu_d[None], (start,)
            ),
            qm1_prev=qm1,
            qm2_prev=qm2,
            qm2_prev2=carry["qm2_prev"],
        )
        return carry, (qb, qm1, qm, qm2)

    carry, rows = jax.lax.scan(step, carry, jnp.arange(1, n))
    qb_rows, qm1_rows, qm_rows, qm2_rows = rows
    pad0 = jnp.zeros((1, n), dt)
    Qb = jnp.concatenate([pad0, qb_rows], axis=0)
    Qm1 = jnp.concatenate([pad0, qm1_rows], axis=0)
    Qm = jnp.concatenate([pad0, qm_rows], axis=0)
    Qm2 = jnp.concatenate([pad0, qm2_rows], axis=0)
    mu = carry["mu"]

    # ---- external chain (log domain; n^2 total, no gathers) ----
    logQbS = jnp.where(Qb > 0, jnp.log(jnp.maximum(Qb, TINY)) + mu[:, None], NEG)
    # end-layout transpose: QbE_T[j, t] = log Qb(span t, end j) = logQbS[t, j-t]
    m_rows = n
    sk = jnp.pad(logQbS, ((0, 0), (0, m_rows)), constant_values=NEG)
    flat = sk.reshape(-1)[: m_rows * (n + m_rows - 1)]
    qbe = flat.reshape(m_rows, n + m_rows - 1)[:, :n]  # qbe[t, j] = logQbS[t, j-t]
    qbe_T = qbe.T  # (j, t)

    def ql_step(c, j):
        qlv, rev = c
        row = qbe_T[j]
        w = jax.lax.dynamic_slice(rev, (n - j + n,), (n,))  # w[t] = Ql[j-t-1]
        paired = jax.nn.logsumexp(row + w)
        val = jnp.logaddexp(qlv[j], paired)
        val = jnp.where(j < length, val, qlv[j])
        qlv = jax.lax.dynamic_update_slice(qlv, val[None], (j + 1,))
        rev = jax.lax.dynamic_update_slice(rev, val[None], (n - (j + 1) + n,))
        return (qlv, rev), None

    qlv0 = jnp.concatenate([jnp.zeros((1,), dt), jnp.full((n,), NEG, dt)])
    rev0 = jnp.full((3 * n + 2,), NEG, dt)
    rev0 = jax.lax.dynamic_update_slice(rev0, jnp.zeros((1,), dt), (2 * n,))
    (qlv, _), _ = jax.lax.scan(ql_step, (qlv0, rev0), jnp.arange(n))
    logZ = qlv[length]

    return dict(Qb=Qb, Qm1=Qm1, Qm=Qm, Qm2=Qm2, mu=mu, logQbS=logQbS,
                qlv=qlv, logZ=logZ)


@partial(jax.jit, static_argnums=(2,))
def _outside_scaled(codes, length, params_key, w_extra, ins):
    """Scaled outside pass -> bpp (n, n) in [i, j] layout."""
    params = _PARAMS_REGISTRY[params_key]
    n = codes.shape[0]
    dt = jnp.float32

    wpair_log, stack_log = _pair_tables(codes, length, params, w_extra)
    i_idx = jnp.arange(n)
    dgrid = jnp.arange(n)[:, None]
    wpairS = jnp.exp(
        jnp.minimum(_span_gather(wpair_log, i_idx[None, :], i_idx[None, :] + dgrid), 60.0)
    ).astype(dt)
    stackS = jnp.exp(
        jnp.minimum(_span_gather(stack_log, i_idx[None, :], i_idx[None, :] + dgrid), 60.0)
    ).astype(dt)
    wpairS_pad = jnp.pad(wpairS, ((0, cpad_rows := 2), (0, 0)))
    stackS_pad = jnp.pad(stackS, ((0, cpad_rows), (0, 0)))

    k2 = jnp.asarray(_interior_kernel(params), dt)
    cdim = k2.shape[0]
    wpairS_cpad = jnp.pad(wpairS, ((0, cdim), (0, 0)))

    b_lin = jnp.float32(np.exp(params.ml_branch))
    c_lin = jnp.float32(np.exp(params.ml_unpaired))
    ab_lin = jnp.float32(np.exp(params.ml_close + params.ml_branch))
    cpow = jnp.asarray(
        np.exp(params.ml_unpaired * np.arange(n, dtype=np.float64)), dt
    )

    Qb, Qm1, Qm, mu = ins["Qb"], ins["Qm1"], ins["Qm"], ins["mu"]
    logQbS, qlv, logZ = ins["logQbS"], ins["qlv"], ins["logZ"]

    # ---- OQl chain (log domain, descending j) ----
    logQbS_T = logQbS.T  # [i, t]
    oql_pad0 = jnp.full((2 * n,), NEG, dt)

    def oql_step(oql_pad, j):
        row = logQbS_T[jnp.clip(j + 1, 0, n - 1)]  # over t: Qb(start j+1, span t)
        win = jax.lax.dynamic_slice(oql_pad, (j + 1,), (n,))  # oql[j+1+t]
        paired = jax.nn.logsumexp(row + win)
        paired = jnp.where(j + 1 < n, paired, jnp.float32(NEG))
        unp = jnp.where(
            j + 1 < length,
            jax.lax.dynamic_slice(oql_pad, (jnp.clip(j + 1, 0),), (1,))[0],
            jnp.float32(NEG),
        )
        val = jnp.logaddexp(unp, paired)
        val = jnp.where(j == length - 1, jnp.float32(0.0), val)
        val = jnp.where(j > length - 1, jnp.float32(NEG), val)
        oql_pad = jax.lax.dynamic_update_slice(oql_pad, val[None], (j,))
        return oql_pad, None

    oql_pad, _ = jax.lax.scan(oql_step, oql_pad0, jnp.arange(n - 1, -1, -1))
    ql_shift = jnp.concatenate([jnp.zeros((1,), dt), qlv[1:n]])  # Ql[i-1]

    zrow = jnp.zeros((n,), dt)
    nbuf = 2 * n + cdim + 2  # covers slices (D, n) and (D, cdim) for any D < n
    carry = dict(
        ob_pad=jnp.zeros((nbuf, n), dt),
        om2_pad=jnp.zeros((nbuf, n), dt),
        om_pad=jnp.zeros((nbuf, n), dt),
        om=jnp.full((nbuf,), NEG, dt),  # offsets, padded indexing by D
        om1_prev=zrow,
    )
    mu_sh = jnp.concatenate([jnp.full((1,), NEG, dt), mu[:-1]])  # mu[t-1]
    qm_sh = jnp.concatenate([jnp.zeros((1, n), dt), Qm[:-1]], axis=0)  # Qm[t-1]

    def step(carry, D):
        om_off = carry["om"]
        om_up = jax.lax.dynamic_slice(om_off, (D,), (n,))       # om[D+t]
        om_up1 = jax.lax.dynamic_slice(om_off, (D + 1,), (n,))  # om[D+1+t]
        oql_sh = _shift_left(oql_pad[:n], D, n)  # oql[i+D] (NEG pad -> use where)
        oql_sh = jnp.where(i_idx + D < n, oql_sh, jnp.float32(NEG))
        ext_log = ql_shift + oql_sh

        p = jnp.maximum(
            jnp.maximum(jnp.max(mu_sh + om_up1), jnp.max(om_up1)),
            jnp.maximum(jnp.max(ext_log), jnp.max(mu + om_up)),
        )
        p = jnp.where(p < -1e29, jnp.float32(0.0), p)

        # ---- Om[D]: sum_{u>D} Qm1[u-D-1, i+D+1] * Om2[u, i] ----
        qm1_sh = _shift_left(Qm1, D + 1, n)  # row r at position i+D+1
        om2_slab = jax.lax.dynamic_slice(
            carry["om2_pad"], (D + 1, 0), (n, n)
        )  # row r = Om2[D+1+r]
        f = jnp.exp(mu + om_up1 - p)  # mu[r] + om[D+1+r]
        om_row = jnp.sum(qm1_sh * om2_slab * f[:, None], axis=0)

        # ---- Om2[D]: multiloop close + Om flow ----
        ob2 = jax.lax.dynamic_slice(carry["ob_pad"], (D + 2, 0), (1, n))[0]
        wp2 = jax.lax.dynamic_slice(wpairS_pad, (D + 2, 0), (1, n))[0]
        close = ab_lin * _shift_right(
            ob2 * wp2 * jnp.exp(om_off[D + 2] - p), 1, 1
        )
        om2_row = close + om_row

        # ---- Om1[D] ----
        inc = c_lin * carry["om1_prev"] * jnp.exp(om_off[D + 1] - p)
        om2_up = jax.lax.dynamic_slice(carry["om2_pad"], (D, 0), (n, n))
        g_b = jnp.exp(mu_sh + om_up - p).at[0].set(0.0)  # mu[t-1]+om[D+t], t>=1
        cb = qm_sh * om2_up * g_b[:, None]
        term_b = _skew_sum(cb)
        om_up_slab = jax.lax.dynamic_slice(carry["om_pad"], (D, 0), (n, n))
        g_c = (cpow * jnp.exp(om_up - p)).at[0].set(0.0)
        cc = om_up_slab * g_c[:, None]
        term_c = om_row + _skew_sum(cc)  # t=0 term is this step's Om row
        om1_row = inc + term_b + term_c

        # ---- Ob[D] ----
        ext = jnp.exp(jnp.minimum(ext_log - p, 60.0))
        stk2 = jax.lax.dynamic_slice(stackS_pad, (D + 2, 0), (1, n))[0]
        stack_term = _shift_right(ob2 * wp2 * stk2 * jnp.exp(om_off[D + 2] - p), 1, 1)
        ob_cslab = jax.lax.dynamic_slice(carry["ob_pad"], (D, 0), (cdim, n))
        wp_cslab = jax.lax.dynamic_slice(wpairS_cpad, (D, 0), (cdim, n))
        f_c = jnp.exp(jax.lax.dynamic_slice(om_off, (D,), (cdim,)) - p)
        slab_ob = ob_cslab * wp_cslab * f_c[:, None]
        int_term = _conv_rows(slab_ob, k2, flip=True)
        ob_row = ext + stack_term + int_term + b_lin * om1_row

        # ---- joint rescale ----
        m = jnp.maximum(
            jnp.maximum(jnp.max(ob_row), jnp.max(om1_row)),
            jnp.maximum(jnp.max(om_row), jnp.max(om2_row)),
        )
        scale = jnp.where(m > 0, m, jnp.float32(1.0))
        inv = 1.0 / scale
        ob_row, om1_row = ob_row * inv, om1_row * inv
        om_row, om2_row = om_row * inv, om2_row * inv
        om_d = jnp.where(m > 0, p + jnp.log(scale), jnp.float32(NEG))

        carry = dict(
            ob_pad=jax.lax.dynamic_update_slice(
                carry["ob_pad"], ob_row[None], (D, 0)
            ),
            om2_pad=jax.lax.dynamic_update_slice(
                carry["om2_pad"], om2_row[None], (D, 0)
            ),
            om_pad=jax.lax.dynamic_update_slice(
                carry["om_pad"], om_row[None], (D, 0)
            ),
            om=jax.lax.dynamic_update_slice(carry["om"], om_d[None], (D,)),
            om1_prev=om1_row,
        )
        return carry, (ob_row, om_d)

    carry, (ob_rows, om_ds) = jax.lax.scan(
        step, carry, jnp.arange(n - 1, 0, -1)
    )
    # rows were emitted for D = n-1 .. 1; reassemble span-major
    Ob = jnp.concatenate([jnp.zeros((1, n), dt), ob_rows[::-1]], axis=0)
    om = jnp.concatenate([jnp.full((1,), NEG, dt), om_ds[::-1]])

    logOb = jnp.where(Ob > 0, jnp.log(jnp.maximum(Ob, TINY)) + om[:, None], NEG)
    logQb = ins["logQbS"]
    # bpp in [i, j] layout: one gather outside the scan
    djj = i_idx[None, :] - i_idx[:, None]
    lq = _span_gather(logQb, djj, jnp.broadcast_to(i_idx[:, None], (n, n)))
    lo = _span_gather(logOb, djj, jnp.broadcast_to(i_idx[:, None], (n, n)))
    bpp = jnp.where(djj > 0, jnp.exp(jnp.minimum(lq + lo - logZ, 0.0)), 0.0)
    return bpp


def _bpp_one(codes, length, params_key, w_extra):
    ins = _inside_scaled(codes, length, params_key, w_extra)
    bpp = _outside_scaled(codes, length, params_key, w_extra, ins)
    return bpp, ins["logZ"]


@partial(jax.jit, static_argnums=(2,))
def _bpp_vmapped(codes, lengths, params_key, w_extra):
    wax = None if w_extra is None else 0
    return jax.vmap(_bpp_one, in_axes=(0, 0, None, wax))(
        codes, lengths, params_key, w_extra
    )


MAX_FOLD_BATCH = 128


def _batch_bucket(b: int) -> int:
    """Geometric batch buckets (8, 16, ..., MAX_FOLD_BATCH): recompiles are
    bounded by O(log B) variants instead of one per dataset size.  The cap
    bounds HBM too — the inside pass stacks O(L) span slices of (B, L, L)
    tables, so an uncapped batch axis scales device memory with corpus size;
    larger corpora are folded in MAX_FOLD_BATCH chunks."""
    n = 8
    while n < b and n < MAX_FOLD_BATCH:
        n *= 2
    return n


def mccaskill_bpp_batch_scaled(
    codes_batch: np.ndarray,
    lengths: np.ndarray,
    params: EnergyParams | None = None,
    *,
    w_extra: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched (bpp, logZ): one vmapped device program for the whole batch.

    Both the sequence-length axis (bucketed by the caller) and the batch
    axis (bucketed here) are padded so any corpus hits a small, cached set
    of compiled programs; padded rows fold a zero-length sequence.
    """
    params = params or default_params()
    key = _register(params)
    codes_np = np.asarray(codes_batch)
    b = codes_np.shape[0]
    if b > MAX_FOLD_BATCH:
        # chunked dispatch: async-queue every chunk, then fetch (device work
        # and tunnel round trips overlap across chunks)
        pending = []
        for s in range(0, b, MAX_FOLD_BATCH):
            chunk = codes_np[s : s + MAX_FOLD_BATCH]
            lens_c = np.asarray(lengths)[s : s + MAX_FOLD_BATCH]
            we_c = None if w_extra is None else np.asarray(w_extra)[s : s + MAX_FOLD_BATCH]
            pending.append(_bpp_dispatch(chunk, lens_c, key, we_c))
        bpps = np.concatenate([np.asarray(p[0][:n]) for p, n in pending])
        logZs = np.concatenate([np.asarray(p[1][:n]) for p, n in pending])
        return bpps, logZs
    (bpp, logZ), n = _bpp_dispatch(codes_np, np.asarray(lengths), key, w_extra)
    return np.asarray(bpp[:n]), np.asarray(logZ[:n])


def _bpp_dispatch(codes_np, lens_np, key, w_extra):
    """Pad one chunk to its batch bucket and dispatch (async)."""
    b = codes_np.shape[0]
    b_pad = _batch_bucket(b)
    codes_np = np.pad(codes_np, ((0, b_pad - b), (0, 0)))
    lens_p = np.pad(lens_np, (0, b_pad - b))
    codes = jnp.asarray(codes_np, jnp.int32)
    lens = jnp.asarray(lens_p, jnp.int32)
    we = None
    if w_extra is not None:
        we = jnp.asarray(
            np.pad(np.asarray(w_extra, np.float32),
                   ((0, b_pad - b), (0, 0), (0, 0)))
        )
    return _bpp_vmapped(codes, lens, key, we), b
