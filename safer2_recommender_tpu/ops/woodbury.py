"""Woodbury solves: turn d x d normal equations into L x L ones.

Every exact solve in this framework has the structure

    A_u  = c0_u * I + c1_u * G + Vh_u^T diag(wt_u) Vh_u
    rhs_u = Vh_u^T r_u

where ``G`` is a *shared* d x d Gramian (V^T V or U^T diag(z) U; reference
ials.h:88-144, safer2.h:104-221) and ``Vh_u`` is the user's [L, d] history
slab. The reference — and our direct path — solves the d x d system per
row (O(d^3/3) each). For rows whose history L is smaller than d, one
shared eigendecomposition ``G = Q diag(lam) Q^T`` per sweep lets Woodbury
shrink the per-row solve to L x L:

    M_u      = c0_u I + c1_u G          (diagonal in the shared eigenbasis)
    M_u^-1   = Q diag(s_u) Q^T,  s_u = 1 / (c1_u * lam + c0_u)
    A_u      = M_u + Vt_u^T Vt_u,  Vt_u = diag(sqrt(wt_u)) Vh_u
    A_u^-1 b = M^-1 b - M^-1 Vt^T (I_L + Vt M^-1 Vt^T)^-1 Vt M^-1 b

The heavy ops become ONE plain [N*L, d] x [d, d] matmul into the
eigenbasis (full MXU rate — unlike batched per-row d x d math) and a
batched L x L SPD solve. At dim 512 this cuts the per-row solve FLOPs by
up to (d/L)^3 / 3 and sidesteps the batched-small-matmul MXU floor that
limits the direct block-Cholesky path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.ops import block_chol

HIGHEST = jax.lax.Precision.HIGHEST

# Use Woodbury only when the history width is at most dim/2 (below that
# the L x L path strictly dominates) and dim is large enough for the
# per-sweep eigh (~40 ms at d=512 on one v5e chip) to amortize.
MIN_DIM = 128


class WideHist(NamedTuple):
    """Column-chunked history descriptor for very long rows (zipf-head
    items / users): the [N, L, d] slab is never materialized; assembly
    streams ``ops/assemble.py::wide_*`` scans instead. ``table`` is
    pre-cast to the compute dtype; ``row_coef`` ([N] or None) scales the
    accumulated history terms; ``extra_vec`` is a per-row scalar table
    gathered alongside (the dual weight on the item side)."""

    table: jax.Array
    bucket: object
    row_coef: Optional[jax.Array]
    extra_vec: Optional[jax.Array]


class SolveParams(NamedTuple):
    """Per-bucket ingredients of the normal equations (see module doc).

    ``emb`` is the masked [N, L, d] history slab (possibly bf16);
    ``wt``/``r`` are [N, L] (masked; ``wt`` >= 0); ``c0``/``c1`` are [N].
    When ``wide`` is set, emb/wt/r are None and the history terms stream
    through column chunks (always the direct d x d path: wide rows have
    width > dim).
    """

    emb: Optional[jax.Array]
    wt: Optional[jax.Array]
    r: Optional[jax.Array]
    c0: jax.Array
    c1: jax.Array
    wide: Optional[WideHist] = None


def maybe_eigh(gram: jax.Array, dim: int, *, use_cg: bool
               ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(Q, lam) of the shared Gramian when the Woodbury path is on."""
    if use_cg or dim < MIN_DIM:
        return None
    lam, q = jnp.linalg.eigh(gram)
    return q, jnp.maximum(lam, 0.0)


def applicable(width: int, dim: int) -> bool:
    return 2 * width <= dim


def solve(p: SolveParams, q: jax.Array, lam: jax.Array) -> jax.Array:
    """Batched Woodbury solve -> new rows [N, d] (f32)."""
    compute_dtype = p.emb.dtype
    # Rotate histories into the shared eigenbasis: ONE plain matmul.
    w = jax.lax.dot_general(
        p.emb, q.astype(compute_dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [N, L, d]
    s = 1.0 / (p.c1[:, None] * lam[None, :] + p.c0[:, None])  # [N, d]

    sq = jnp.sqrt(p.wt)
    wts = w * sq[:, :, None]                                  # Vt Q
    wts_c = wts.astype(compute_dtype)
    k = jnp.einsum("nle,nme->nlm", (wts * s[:, None, :]).astype(compute_dtype),
                   wts_c, preferred_element_type=jnp.float32)
    k = k + jnp.eye(k.shape[-1], dtype=k.dtype)

    # matvec-like contractions as multiply+reduce (XLA's batched mat-vec
    # lowering pays a fixed per-element MXU cost that dominates at scale)
    rv = jnp.sum(w * p.r[:, :, None], axis=1)                 # Q^T rhs
    z = s * rv
    u = jnp.sum(wts * z[:, None, :], axis=2)
    y = block_chol.spd_solve(k, u)
    wty = jnp.sum(wts * y[:, :, None], axis=1)
    out = z - s * wty
    return jax.lax.dot_general(
        out.astype(jnp.float32), q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [N, d]
