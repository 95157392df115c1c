"""Stem kernel over structure DAGs as batched MXU matmuls.

TPU-first redesign of the reference's DAG convolution kernel
(/root/reference/stem_kernel_lite/stem_kernel.cpp:14-95).  The reference
iterates ragged per-node edge lists cell by cell:

    MATCH: K1/G1 += node_score(i,j) * edge_score(ex,ey) * G0[ex.to][ey.to]
    IY:    K1 += K1[ey.to];  G1 += gapscore(j) * edgescore(ey) * G1[ey.to]
    IX:    K0 = K1 + sum K0[ex.to];  G0 = G1 + gapscore(i)*edgescore(ex)*G0[ex.to]
    result = sum over root pairs of K0

Because the IX/IY recursions are *linear and nilpotent* over the acyclic
DAGs, they admit closed-form closures: with per-example dense operators

    A[i,c]  = gap^gaps * edge_w          (match-path edge coefficients)
    B[i,c]  = gap^2 * w_i * A[i,c]       (gap-path coefficients)
    V       = (I - B)^{-1}               (gap closure)
    u       = (I - T^T)^{-1} r           (root-reach path counts, T = 0/1)
    L[i,j]  = leaf_x[i] * leaf_y[j]      (base case K0 = G0 = 1)

the whole DP collapses to a fixed-point of two batched matmuls per
match-nesting level:

    G0 = Vx @ (M @ Vy^T + L)
    M  = NS * (Ax @ G0 @ Ay^T)

iterated `depth` times (the maximum nested-match depth, precomputed at DAG
build time; extra iterations are no-ops), and the kernel value is the
bilinear form  u_x^T (M + L) u_y.  Everything is (B, N, N) matmuls — the MXU
does the convolution; no gather/scatter, no ragged loops.

Node scores (score_table.cpp:14-53, 118-201) are one 16x16 contraction of
flattened base-pair frequency profiles plus rank-1 gap corrections:

    NS = Fx @ CS @ Fy^T + nbp_x ⊗ g2w_y + g2w_x ⊗ nbp_y
    CS_subst[ab, cd]  = exp(beta * RIBOSUM_P[a,b,c,d])
    CS_simple[ab, cd] = match if (a,b)==(c,d) else mismatch
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ribosum_data import RIBOSUM_P


def subst_co_table(beta: float) -> np.ndarray:
    """exp(RIBOSUM_P * beta) flattened to (16, 16) (SubstNodeScore ctor)."""
    return np.exp(RIBOSUM_P * beta).reshape(16, 16).astype(np.float32)


def simple_co_table(match: float, mismatch: float) -> np.ndarray:
    """match/mismatch over base-pair identities (SimpleNodeScore)."""
    t = np.full((16, 16), mismatch, dtype=np.float32)
    np.fill_diagonal(t, match)
    return t


@partial(jax.jit, static_argnames=("iters", "len_band", "precision", "force_xla"))
def stem_kernel_pairs(
    x: dict, y: dict, co_table: jax.Array, *, iters: int, len_band: int = 0,
    precision: str = "highest", force_xla: bool = False,
) -> jax.Array:
    """Batched stem-kernel values for pairs of DAG feature dicts.

    Feature dicts (from dag.dag_matrices, stacked with leading batch axis):
    A (B,N,N), V (B,N,N), u (B,N), leaf (B,N), bp_freq (B,N,16),
    gap2w (B,N), nbp_frac (B,N), length (B,N), valid (B,N).

    ``precision``: MXU pass count for the closure matmuls — "highest"
    (6-pass bf16 = full f32, the validation mode), "high" (3-pass, ~f24
    mantissa, ~1e-3 relative on unnormalized values — the shipped default),
    or "default" (1 bf16 pass).  The final bilinear form always runs at
    full f32.  Backend routing (measured, BASELINE.md): "highest" runs the
    VMEM-resident Pallas fixed point (ops/pallas_stem, +14%% over the XLA
    loop and per-pair dynamic trip counts); "high"/"default" run the XLA
    batched-einsum loop, whose pipelined batched matmuls win once the MXU
    pass count drops.
    """
    hp = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH,
          "default": jax.lax.Precision.DEFAULT}[precision]
    full = jax.lax.Precision.HIGHEST
    ns = jnp.einsum(
        "bik,kl,bjl->bij", x["bp_freq"], co_table, y["bp_freq"],
        preferred_element_type=jnp.float32, precision=hp,
    )
    ns = ns + x["nbp_frac"][:, :, None] * y["gap2w"][:, None, :]
    ns = ns + x["gap2w"][:, :, None] * y["nbp_frac"][:, None, :]
    match_ok = (
        (1.0 - x["leaf"])[:, :, None]
        * (1.0 - y["leaf"])[:, None, :]
        * x["valid"][:, :, None]
        * y["valid"][:, None, :]
    )
    if len_band > 0:
        band = (
            jnp.abs(x["length"][:, :, None] - y["length"][:, None, :]) <= len_band
        ).astype(ns.dtype)
        match_ok = match_ok * band
    ns = ns * match_ok

    L = x["leaf"][:, :, None] * y["leaf"][:, None, :]

    # Pallas pads the node axis to 128 lanes, so route small DAG corpora
    # (N < 96) to the einsum loop where padding waste would dominate.
    if (not force_xla
            and jax.default_backend() in ("tpu", "axon")
            and precision == "highest" and ns.shape[1] >= 96):
        # VMEM-resident Pallas fixed point: operands load once per pair and
        # all iterations run on-chip, with per-pair dynamic trip counts
        from ..ops.pallas_stem import stem_fixed_point

        if "depth" in x and "depth" in y:
            itv = jnp.minimum(x["depth"], y["depth"]).astype(jnp.int32) + 1
        else:
            itv = jnp.full((ns.shape[0],), iters, jnp.int32)
        value = stem_fixed_point(
            ns, x["V"], y["V"], x["A"], y["A"], L, x["u"], y["u"], itv,
            max_iters=iters, precision=precision,
        )
    else:
        VyT = jnp.swapaxes(y["V"], 1, 2)
        AyT = jnp.swapaxes(y["A"], 1, 2)

        def mm(a, b):
            return jnp.einsum("bij,bjk->bik", a, b,
                              preferred_element_type=jnp.float32, precision=hp)

        def body(_, m):
            g0 = mm(x["V"], mm(m, VyT) + L)
            return ns * mm(x["A"], mm(g0, AyT))

        m = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(ns))
        value = jnp.einsum("bi,bij,bj->b", x["u"], m, y["u"],
                           preferred_element_type=jnp.float32, precision=full)
    # The leaf-leaf base (K0 = 1) propagates only along the x-side K chain in
    # the reference recursion (K1's IY accumulation never reads it), so its
    # contribution pairs u_x with the RAW root indicator r_y:
    # value += (u_x . leaf_x) * (r_y . leaf_y).  Nonzero only when a root is
    # itself a leaf (degenerate unstructured input).
    value = value + jnp.sum(x["u"] * x["leaf"], -1) * jnp.sum(y["r"] * y["leaf"], -1)
    return value


class StemKernel:
    """Configured stem kernel (SuStemKernel / SiStemKernel equivalents).

    Defaults mirror the reference CLI (stem_kernel_lite/main.cpp:115-149):
    loop_gap=0.2, beta=0.3 (RIBOSUM) or stack=1.3/covar=0.8 (simple),
    len_band=10 (0 disables).
    """

    def __init__(
        self,
        *,
        loop_gap: float = 0.2,
        beta: float | None = 0.3,
        stack: float | None = None,
        covar: float | None = None,
        len_band: int = 0,
        precision: str = "highest",
    ) -> None:
        if beta is not None:
            self.co_table = jnp.asarray(subst_co_table(beta))
        elif stack is not None and covar is not None:
            self.co_table = jnp.asarray(simple_co_table(stack, covar))
        else:
            raise ValueError("need beta (RIBOSUM) or stack/covar (simple)")
        self.loop_gap = loop_gap
        self.len_band = len_band
        self.precision = precision

    def __call__(self, x: dict, y: dict, *, iters: int) -> jax.Array:
        return stem_kernel_pairs(
            x, y, self.co_table, iters=iters, len_band=self.len_band,
            precision=self.precision,
        )
