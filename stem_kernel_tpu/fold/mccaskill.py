"""McCaskill partition function + base-pair probabilities, batched in JAX.

In-framework replacement for the reference's Vienna `pf_fold` calls
(/root/reference/common/bpmatrix.cpp:151-177, common/pf_wrapper.cpp:15-36).

TPU-first design:

- all DP tables live in **span layout** ``T[d, i]`` = value of subsequence
  (i, i+d), so each anti-diagonal of the classic triangular tables is one
  contiguous row — the scan over span length d does O(n)-to-O(n^2) of fully
  vectorized work per step instead of per-cell updates;
- everything is **log-space** (logaddexp/logsumexp), which makes Vienna's
  `pf_scale` overflow machinery (bpmatrix.cpp:158-165) unnecessary;
- split-point sums (multiloop segment composition) are batched gathers over
  shifted rows, the O(n^3) core;
- interior loops enumerate static (a, b) offset lists bounded by
  ``max_interior`` exactly like Vienna's MAXLOOP bound;
- base-pair probabilities come from an **explicit outside pass** (same span
  layout, scanned top-down), keeping memory at O(n^2) — reverse-mode AD
  through the inside scan would store O(n^3) residuals.  The identity
  bpp = d logZ / d w_pair is used in tests as an independent oracle.

Recursions (log-space; ⊕ = logaddexp):
    Qb[i,j] = w[i,j] + ( hairpin(d-1)
                       ⊕ stack(i,j) + Qb[i+1,j-1]
                       ⊕ (+)_{a,b} interior(a-1,b-1) + Qb[i+a,j-b]
                       ⊕ ml_close + 2*ml_branch... (closing + branch) + Qm2[i+1,j-1] )
    Qm1[i,j] = (Qm1[i,j-1] + ml_unpaired) ⊕ (ml_branch + Qb[i,j])
    Qm2[i,j] = (+)_{t>=1} Qm[i,i+t-1] + Qm1[i+t,j]
    Qm[i,j]  = Qm2[i,j] ⊕ (+)_{t>=0} t*ml_unpaired + Qm1[i+t,j]
    Ql[j]    = Ql[j-1] ⊕ (+)_k Ql[k-1] + Qb[k,j]      (external chain)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import (
    EnergyParams,
    N_PAIR,
    PAIR_TYPE,
    default_params,
    hairpin_score,
    interior_score,
)

NEG = -1e30


def _interior_offsets(params: EnergyParams) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (a, b) offset lists for interior/bulge loops, excluding (1,1)."""
    offs = []
    pens = []
    for a in range(1, params.max_interior + 2):
        for b in range(1, params.max_interior + 2):
            if a == 1 and b == 1:
                continue
            if (a - 1) + (b - 1) > params.max_interior:
                continue
            offs.append((a, b))
            pens.append(float(interior_score(params, a - 1, b - 1)))
    offs = np.asarray(offs, dtype=np.int32)
    return offs[:, 0], offs[:, 1], np.asarray(pens)


def _pair_tables(codes: jax.Array, length: jax.Array, params: EnergyParams, w_extra):
    """(wpair, stack_diag) lookups over the (n, n) pair grid.

    wpair[i, j] = pair-type bonus + optional extra log-weight, NEG where the
    pair is disallowed (non-canonical, too close, out of sequence).
    stacklut[i, j] = stack score for outer pair (i, j) over inner (i+1, j-1).
    """
    n = codes.shape[0]
    pt = jnp.asarray(PAIR_TYPE)[codes[:, None], codes[None, :]]  # (n, n)
    ii = jnp.arange(n)
    dmat = ii[None, :] - ii[:, None]
    ok = (pt >= 0) & (dmat > params.min_hairpin) & (ii[None, :] < length)
    bonus = jnp.asarray(params.pair_bonus)
    wpair = jnp.where(ok, bonus[jnp.clip(pt, 0)], NEG)
    if w_extra is not None:
        wpair = jnp.where(ok, wpair + w_extra, NEG)
    inner_pt = jnp.roll(jnp.roll(pt, -1, axis=0), 1, axis=1)  # pt[i+1, j-1]
    stack_tab = jnp.asarray(params.stack)
    stacklut = stack_tab[jnp.clip(pt, 0), jnp.clip(inner_pt, 0)]
    stacklut = jnp.where((pt >= 0) & (inner_pt >= 0), stacklut, NEG)
    return wpair, stacklut


def _span_gather(table: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """table[rows, cols] with out-of-range -> NEG.  rows/cols broadcast."""
    n = table.shape[-1]
    valid = (rows >= 0) & (rows < n) & (cols >= 0) & (cols < n)
    flat = jnp.clip(rows, 0, n - 1) * n + jnp.clip(cols, 0, n - 1)
    return jnp.where(valid, jnp.take(table.reshape(-1), flat), NEG)


@partial(jax.jit, static_argnums=(2,))
def _inside(codes: jax.Array, length: jax.Array, params_key, w_extra, hp_vec, ia, ib, ipen):
    """Inside pass.  Returns (Qb, Qm1, Qm, Qm2, Ql, logZ), tables in span layout."""
    params = _PARAMS_REGISTRY[params_key]
    n = codes.shape[0]
    dt = hp_vec.dtype
    wpair, stacklut = _pair_tables(codes, length, params, w_extra)
    wpair = wpair.astype(dt)
    stacklut = stacklut.astype(dt)

    i_idx = jnp.arange(n)
    t_idx = jnp.arange(n)  # split offsets
    b_ml = dt.type(params.ml_branch)
    c_ml = dt.type(params.ml_unpaired)
    a_ml = dt.type(params.ml_close)

    def ij_diag(mat, d):
        # mat is [i, j]-layout; return mat[i, i+d] as a vector over i
        return _span_gather(mat, i_idx, i_idx + d)

    init = (
        jnp.full((n, n), NEG, dt),  # Qb   (span layout [d, i])
        jnp.full((n, n), NEG, dt),  # Qm1
        jnp.full((n, n), NEG, dt),  # Qm
        jnp.full((n, n), NEG, dt),  # Qm2
    )

    def step(carry, d):
        Qb, Qm1, Qm, Qm2 = carry
        w_row = ij_diag(wpair, d)  # (n,)
        st_row = ij_diag(stacklut, d)

        # hairpin: d-1 unpaired
        hp = jnp.where(d - 1 >= params.min_hairpin, hp_vec[jnp.clip(d - 1, 0)], dt.type(NEG))
        acc = jnp.broadcast_to(hp, (n,))

        # stack (a=b=1): inner span d-2 starting at i+1
        stack_term = st_row + _span_gather(Qb, jnp.full((n,), d - 2), i_idx + 1)
        acc = jnp.logaddexp(acc, stack_term)

        # interior loops: offsets (ia, ib), penalty ipen
        rows = d - (ia + ib)  # (K,)
        it = ipen[:, None] + _span_gather(Qb, rows[:, None], i_idx[None, :] + ia[:, None])
        acc = jnp.logaddexp(acc, jax.nn.logsumexp(it, axis=0))

        # multiloop closing: a + b (closing pair counts as a branch) + Qm2[i+1, j-1]
        ml = a_ml + b_ml + _span_gather(Qm2, jnp.full((n,), d - 2), i_idx + 1)
        acc = jnp.logaddexp(acc, ml)

        qb_row = w_row + acc

        # Qm1 incremental: Qm1[i, i+d] = (Qm1[i, i+d-1] + c) ⊕ (b + Qb[i, i+d])
        qm1_row = jnp.logaddexp(Qm1[d - 1] + c_ml, b_ml + qb_row)

        # split gathers: A[t, i] = Qm1[i+t, i+d] (span d-t)
        A = _span_gather(Qm1, (d - t_idx)[:, None], i_idx[None, :] + t_idx[:, None])
        A = A.at[0].set(qm1_row)  # t = 0 uses this step's fresh row
        # B[t, i] = Qm[i, i+t-1] (span t-1); t = 0 row invalid -> NEG
        B = _span_gather(Qm, (t_idx - 1)[:, None], jnp.broadcast_to(i_idx, (n, n)))

        qm2_row = jax.nn.logsumexp(jnp.where(t_idx[:, None] >= 1, B + A, NEG), axis=0)
        unp = jax.nn.logsumexp(c_ml * t_idx[:, None].astype(dt) + A, axis=0)
        qm_row = jnp.logaddexp(qm2_row, unp)

        Qb = Qb.at[d].set(qb_row)
        Qm1 = Qm1.at[d].set(qm1_row)
        Qm = Qm.at[d].set(qm_row)
        Qm2 = Qm2.at[d].set(qm2_row)
        return (Qb, Qm1, Qm, Qm2), None

    (Qb, Qm1, Qm, Qm2), _ = jax.lax.scan(step, init, jnp.arange(1, n))

    # external chain over prefixes: Ql[j], with Ql[-1] = 0 represented by index 0
    def ext_step(ql, j):
        # ql: (n+1,) with ql[k] = Ql[k-1]
        prev = ql[j]  # Ql[j-1]
        # sum over k: Ql[k-1] + Qb[k, j]
        qb_col = _span_gather(Qb, j - i_idx, i_idx)  # Qb[k, j] over k
        paired = jax.nn.logsumexp(ql[:n] + qb_col, axis=0)
        val = jnp.logaddexp(prev, paired)
        val = jnp.where(j < length, val, prev)
        ql = ql.at[j + 1].set(val)
        return ql, None

    ql0 = jnp.concatenate([jnp.zeros((1,), dt), jnp.full((n,), NEG, dt)])
    ql, _ = jax.lax.scan(ext_step, ql0, jnp.arange(n))
    logZ = ql[length]
    return Qb, Qm1, Qm, Qm2, ql, logZ


@partial(jax.jit, static_argnums=(2,))
def _outside(codes, length, params_key, w_extra, hp_vec, ia, ib, ipen,
             Qb, Qm1, Qm, Qm2, ql, logZ):
    """Outside pass: log outside values for Qb, then base-pair probabilities.

    Mirrors the inside recursions in reverse (span scanned top-down); each
    outside table receives the derivative flow of every inside use site:
      Om  <- Qm2 split (left part Qm[i,k-1])
      Om2 <- Qb multiloop closing; Qm (Qm = Qm2 ⊕ unpaired-prefix branch)
      Om1 <- Qm1 increment; Qm2 split (right part); Qm unpaired-prefix branch
      Ob  <- exterior chain; interior loops (as inner pair); Qm1 branch entry
    Finally bpp[i,j] = exp(Qb[i,j] + Ob[i,j] - logZ).
    """
    params = _PARAMS_REGISTRY[params_key]
    n = codes.shape[0]
    dt = Qb.dtype
    wpair, stacklut = _pair_tables(codes, length, params, w_extra)
    wpair = wpair.astype(dt)
    stacklut = stacklut.astype(dt)

    i_idx = jnp.arange(n)
    u_idx = jnp.arange(n)
    b_ml = dt.type(params.ml_branch)
    c_ml = dt.type(params.ml_unpaired)
    a_ml = dt.type(params.ml_close)

    # --- outside of the external chain: OQl[j] over j ---
    def oql_step(oql, j):
        # descending j; oql[l] already computed for l > j
        unpaired = jnp.where(j + 1 < length, jnp.take(oql, jnp.clip(j + 1, 0, n - 1)), dt.type(NEG))
        # pairs (j+1, l): Qb[j+1, l] = Qb_span[l-(j+1), j+1]
        qb_vec = _span_gather(Qb, u_idx - (j + 1), jnp.full((n,), j + 1))
        paired = jax.nn.logsumexp(qb_vec + oql, axis=0)
        val = jnp.logaddexp(unpaired, paired)
        val = jnp.where(j == length - 1, dt.type(0.0), val)
        val = jnp.where(j > length - 1, dt.type(NEG), val)
        oql = oql.at[j].set(val)
        return oql, None

    oql0 = jnp.full((n,), NEG, dt)
    oql, _ = jax.lax.scan(oql_step, oql0, jnp.arange(n - 1, -1, -1))

    # [i, j]-layout helpers for gathers into wpair/stacklut
    def ij_gather(mat, r, c):
        return _span_gather(mat, r, c)

    init = (
        jnp.full((n, n), NEG, dt),  # Ob
        jnp.full((n, n), NEG, dt),  # Om1
        jnp.full((n, n), NEG, dt),  # Om
        jnp.full((n, n), NEG, dt),  # Om2
    )

    def step(carry, D):
        Ob, Om1, Om, Om2 = carry
        j = i_idx + D  # right end per start i

        # --- Om[D][i]: from Qm2 splits with left part Qm[i, i+D] ---
        # sum over outer span u > D: Qm1[u-D-1, i+D+1] + Om2[u, i]
        A2 = _span_gather(Qm1, (u_idx - D - 1)[:, None], jnp.broadcast_to(i_idx + D + 1, (n, n))) \
            + _span_gather(Om2, u_idx[:, None], jnp.broadcast_to(i_idx, (n, n)))
        om_row = jax.nn.logsumexp(jnp.where(u_idx[:, None] > D, A2, NEG), axis=0)
        Om = Om.at[D].set(om_row)

        # --- Om2[D][i]: multiloop closing by pair (i-1, j+1); plus Qm flow ---
        close = ij_gather(Ob, jnp.full((n,), D + 2), i_idx - 1)  # Ob_span[D+2, i-1]
        close = close + ij_gather(wpair, i_idx - 1, j + 1) + a_ml + b_ml
        om2_row = jnp.logaddexp(close, om_row)
        Om2 = Om2.at[D].set(om2_row)

        # --- Om1[D][i] ---
        inc = Om1[jnp.clip(D + 1, 0, n - 1)] + c_ml
        inc = jnp.where(D + 1 < n, inc, NEG)
        # (b) split right part: t >= 1: Qm[t-1, i-t] + Om2[D+t, i-t]
        Tb = _span_gather(Qm, (u_idx - 1)[:, None], i_idx[None, :] - u_idx[:, None]) \
            + _span_gather(Om2, (D + u_idx)[:, None], i_idx[None, :] - u_idx[:, None])
        term_b = jax.nn.logsumexp(jnp.where(u_idx[:, None] >= 1, Tb, NEG), axis=0)
        # (c) unpaired prefix: t >= 0: c*t + Om[D+t, i-t]
        Tc = c_ml * u_idx[:, None].astype(dt) \
            + _span_gather(Om, (D + u_idx)[:, None], i_idx[None, :] - u_idx[:, None])
        term_c = jax.nn.logsumexp(Tc, axis=0)
        om1_row = jnp.logaddexp(jnp.logaddexp(inc, term_b), term_c)
        Om1 = Om1.at[D].set(om1_row)

        # --- Ob[D][i] ---
        # exterior: Ql[i-1] + OQl[j]
        ext = ql[jnp.clip(i_idx, 0, n)] + jnp.where(j < n, jnp.take(oql, jnp.clip(j, 0, n - 1)), dt.type(NEG))
        # stack as inner pair of (i-1, j+1)
        stk = ij_gather(Ob, jnp.full((n,), D + 2), i_idx - 1) \
            + ij_gather(wpair, i_idx - 1, j + 1) + ij_gather(stacklut, i_idx - 1, j + 1)
        acc = jnp.logaddexp(ext, stk)
        # interior loops as inner pair of (i-a, j+b)
        it = ipen[:, None] \
            + _span_gather(Ob, (D + ia + ib)[:, None], i_idx[None, :] - ia[:, None]) \
            + ij_gather(wpair, i_idx[None, :] - ia[:, None], j[None, :] + ib[:, None])
        acc = jnp.logaddexp(acc, jax.nn.logsumexp(it, axis=0))
        # multiloop branch entry
        acc = jnp.logaddexp(acc, b_ml + om1_row)
        Ob = Ob.at[D].set(acc)

        return (Ob, Om1, Om, Om2), None

    (Ob, Om1, Om, Om2), _ = jax.lax.scan(step, init, jnp.arange(n - 1, 0, -1))

    # bpp in [i, j] layout
    dgrid = i_idx[None, :] - i_idx[:, None]  # j - i
    qb_ij = _span_gather(Qb, dgrid, jnp.broadcast_to(i_idx[:, None], (n, n)))
    ob_ij = _span_gather(Ob, dgrid, jnp.broadcast_to(i_idx[:, None], (n, n)))
    bpp = jnp.where(dgrid > 0, jnp.exp(qb_ij + ob_ij - logZ), 0.0)
    return bpp


# params objects are static to jit; register them by CONTENT digest so two
# equal EnergyParams (e.g. repeated default_params() calls) hit the same
# compiled program instead of retracing per object identity.
_PARAMS_REGISTRY: dict[str, EnergyParams] = {}


def _register(params: EnergyParams) -> str:
    import hashlib

    h = hashlib.sha1()
    for f in (
        params.stack, params.pair_bonus, params.hairpin_init,
        params.hairpin_slope, params.bulge_init, params.bulge_slope,
        params.interior_init, params.interior_slope, params.interior_asym,
        params.ml_close, params.ml_branch, params.ml_unpaired,
        params.max_interior, params.min_hairpin,
    ):
        h.update(np.asarray(f, np.float64).tobytes())
    key = h.hexdigest()
    _PARAMS_REGISTRY.setdefault(key, params)
    return key


def _prep(params: EnergyParams, n: int, dtype):
    hp_vec = jnp.asarray(hairpin_score(params, np.arange(max(n, 4))), dtype)
    ia, ib, ipen = _interior_offsets(params)
    return hp_vec, jnp.asarray(ia), jnp.asarray(ib), jnp.asarray(ipen, dtype)


def mccaskill_logZ(
    seq_codes: np.ndarray,
    length: int | None = None,
    params: EnergyParams | None = None,
    *,
    w_extra: np.ndarray | None = None,
    dtype=jnp.float32,
) -> float:
    """Log partition function of a single sequence (codes in A,C,G,U=0..3)."""
    params = params or default_params()
    codes = jnp.asarray(seq_codes, jnp.int32)
    n = codes.shape[0]
    length = n if length is None else length
    hp_vec, ia, ib, ipen = _prep(params, n, dtype)
    key = _register(params)
    *_, logZ = _inside(codes, jnp.asarray(length), key,
                       None if w_extra is None else jnp.asarray(w_extra, dtype),
                       hp_vec, ia, ib, ipen)
    return float(logZ)


def mccaskill_bpp(
    seq_codes: np.ndarray,
    length: int | None = None,
    params: EnergyParams | None = None,
    *,
    w_extra: np.ndarray | None = None,
    dtype=jnp.float32,
) -> tuple[np.ndarray, float]:
    """(bpp, logZ) for one sequence; bpp[i, j] = P(i pairs j), i < j, 0-based.

    The TPU replacement for Vienna pf_fold + pr-matrix extraction
    (/root/reference/common/bpmatrix.cpp:166-174, common/pf_wrapper.cpp:15-36).
    """
    params = params or default_params()
    codes = jnp.asarray(seq_codes, jnp.int32)
    n = codes.shape[0]
    length = n if length is None else length
    hp_vec, ia, ib, ipen = _prep(params, n, dtype)
    key = _register(params)
    we = None if w_extra is None else jnp.asarray(w_extra, dtype)
    Qb, Qm1, Qm, Qm2, ql, logZ = _inside(
        codes, jnp.asarray(length), key, we, hp_vec, ia, ib, ipen
    )
    bpp = _outside(
        codes, jnp.asarray(length), key, we, hp_vec, ia, ib, ipen,
        Qb, Qm1, Qm, Qm2, ql, logZ,
    )
    return np.asarray(bpp), float(logZ)


def mccaskill_bpp_batch(
    codes_batch: np.ndarray,
    lengths: np.ndarray,
    params: EnergyParams | None = None,
    *,
    dtype=jnp.float32,
    engine: str = "scaled",
) -> tuple[np.ndarray, np.ndarray]:
    """Batched (bpp, logZ) over padded code arrays (B, n).

    ``engine="scaled"`` (default) runs the whole batch as ONE vmapped
    device program in the scaled linear domain (see
    :mod:`.mccaskill_scaled`) — no gathers, per-span rescaling, orders of
    magnitude faster.  ``engine="log"`` keeps the exact log-space
    per-example path (the oracle): its gather-heavy steps explode XLA-TPU
    compile time under vmap, so the batch is dispatched as a Python loop
    over the two per-example jits with async dispatch overlapping the
    examples.
    """
    params = params or default_params()
    if engine == "scaled":
        from .mccaskill_scaled import mccaskill_bpp_batch_scaled

        return mccaskill_bpp_batch_scaled(codes_batch, lengths, params)
    codes = jnp.asarray(codes_batch, jnp.int32)
    n = codes.shape[1]
    hp_vec, ia, ib, ipen = _prep(params, n, dtype)
    key = _register(params)
    lengths = np.asarray(lengths)

    pending = []
    for b in range(codes.shape[0]):
        c = codes[b]
        l = jnp.asarray(int(lengths[b]))
        Qb, Qm1, Qm, Qm2, ql, logZ = _inside(c, l, key, None, hp_vec, ia, ib, ipen)
        bpp = _outside(c, l, key, None, hp_vec, ia, ib, ipen,
                       Qb, Qm1, Qm, Qm2, ql, logZ)
        pending.append((bpp, logZ))
    bpps = np.stack([np.asarray(b) for b, _ in pending])
    logZs = np.asarray([float(z) for _, z in pending])
    return bpps, logZs
