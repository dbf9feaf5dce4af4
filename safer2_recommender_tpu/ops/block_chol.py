"""Batched SPD solve via recursive block Cholesky inversion.

The TPU-native replacement for the reference's per-row Eigen LLT solves
(reference ials.h:133-143): one ALS sweep is a batched normal-equation
solve per user/item bucket, and XLA's built-in batched ``cholesky`` +
``triangular_solve`` lower to loop-heavy code measured ~3 orders of
magnitude below the MXU roofline on TPU (0.25 TFLOP/s at [928, 256, 256]
vs ~160 TFLOP/s for plain batched matmuls on the same chip).

Design: compute ``inv(chol(A))`` by recursive 2x2 blocking,

    L = [[L11, 0], [L21, L22]],
    inv(L) = [[inv(L11), 0], [-inv(L22) L21 inv(L11), inv(L22)]],

recursing on the halves down to closed-form 2x2 leaves. Every non-leaf
operation is a large batched MXU matmul; there is no sequential scalar
loop anywhere, which is what kills both XLA's native lowering (per-column
while loops) and a Pallas in-kernel ``fori_loop`` formulation (TPU grid
programs are serial on the single TensorCore, so N/BN * d micro-steps
dominate). The explicit inverse costs ~3x the FLOPs of a factorization,
but at MXU rates that is still ~50x faster than the alternatives, and the
subsequent solves become two batched mat-vecs.

All dots run at ``Precision.HIGHEST``: the default bf16 MXU rounding loses
~2 decimal digits on the factorization, far above f32 solver error. This
module is pure XLA and runs identically on CPU (used by the test suite).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    """Pallas interpret mode: lets the CPU test mesh exercise the lane
    kernels and their SPMD partitioning without TPU hardware."""
    return os.environ.get("FRT_PALLAS_INTERPRET") == "1"

# Recursion stops here; on TPU the leaf runs as a lane-major Pallas kernel.
_LEAF = 32
_LEAF_LANES = 256   # live [32, 32, NL] f32 buffers must fit 16MB VMEM


def _bdot(lhs: jax.Array, rhs: jax.Array, contract) -> jax.Array:
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(contract, ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGHEST)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _leaf_kernel(blk_ref, ridge_ref, inv_ref, *, r: int):
    """inv(chol(blk + diag(ridge))) for a lane-major [r, r, NL] tile;
    ``ridge`` is [r, NL] (a full per-diagonal-element shift — the scalar
    per-system case arrives pre-broadcast).

    Layout is (row, col, batch): the batch rides the 128-wide lane
    dimension, so the per-column masked updates waste nothing to tile
    padding (batch-major [N, r, r] tiles pad r up to 128 lanes — a 4-16x
    waste that made both XLA's lowering and a batch-major kernel slow).
    One fused step j computes Cholesky column j and row j of the inverse
    (row j of L is final by step j). The column loop is fully UNROLLED
    (static trip count), which buys two things over a ``fori_loop``:
    no ~1.5us/step loop plumbing, and j is a Python int so column/row
    extraction is a STATIC slice instead of a masked reduction, and the
    rank-1 update fuses with the column write:

        blk' = blk*(1-oh_c) + col (x) (oh - col*right)

    Measured at [70k, 32, 32]: fori+masked 25.4 ms -> unrolled 15.5 ms
    -> static-slice fused 7.2 ms.

    ``ridge`` ([1, NL]) is the per-system diagonal shift (the normal
    equations' reg * I), applied lazily when each pivot column is read —
    assembly-side it would cost a full memory-bound pass over the
    [N, d, d] slabs; here it is one fused FMA in VMEM.
    """
    row_i = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)      # [r, 1]

    ridge = ridge_ref[:]                                        # [r, NL]
    blk = blk_ref[:]
    inv = jnp.zeros_like(blk)
    for j in range(r):
        oh = (row_i == j).astype(jnp.float32)                   # [r, 1]
        right = (row_i > j).astype(jnp.float32)
        below = (row_i >= j).astype(jnp.float32)
        lt = (row_i < j).astype(jnp.float32)
        keep = 1.0 - oh
        # --- Cholesky column j (static slice; rows >= j kept) ---
        colv = blk[:, j, :] + oh * ridge[j]                     # [r, NL]
        piv = colv[j:j + 1, :]                                  # [1, NL]
        inv_piv = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))
        col = colv * inv_piv * below
        # fused rank-1 trailing update + normalized-column write
        m = oh - col * right                                    # [r, NL]
        blk = blk * keep[None, :, :] + col[:, None, :] * m[None, :, :]
        # --- inverse row j: (e_j - L[j,:j] @ inv[:j]) / L[j,j] ---
        lrow = blk[j, :, :] * lt                                # [r, NL]
        prod = jnp.sum(inv * lrow[:, None, :], axis=0)          # [r, NL]
        rowv = (oh - prod) * inv_piv
        inv = inv * keep[:, None, :] + rowv[None, :, :] * oh[:, None, :]
    inv_ref[:] = inv


def _leaf_lane(at: jax.Array, ridge: jax.Array) -> jax.Array:
    """Leaf on a lane-major [r, r, N] batch (N a multiple of _LEAF_LANES).
    ``ridge`` is [r, N] (per diagonal element)."""
    r, _, n = at.shape
    nl = _LEAF_LANES
    return pl.pallas_call(
        functools.partial(_leaf_kernel, r=r),
        grid=(n // nl,),
        in_specs=[pl.BlockSpec((r, r, nl), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((r, nl), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, r, nl), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, r, n), jnp.float32),
        input_output_aliases={0: 0},
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * r ** 3 / 3),
            bytes_accessed=int(2 * n * r * r * 4),
            transcendentals=int(n * r),
        ),
    )(at, ridge)


def _lane_matmul_kernel(a_ref, b_ref, o_ref, *, h: int, trans_b: bool):
    """o = a @ b (or a @ b^T) per lane: [h, h, NL] operands.

    Fully unrolled k-loop of broadcast FMAs on the VPU. XLA's batched
    matmul at these shapes pays a fixed ~0.25-1us *per batch element*
    (each element is a separate under-filled MXU pass); the lane-major
    form amortizes over the 128-wide lane dimension instead.
    """
    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros_like(a)
    for k in range(h):
        ak = a[:, k, :]                                     # [h, NL]
        bk = b[:, k, :] if trans_b else b[k, :, :]          # [h, NL]
        acc = acc + ak[:, None, :] * bk[None, :, :]
    o_ref[:] = acc


def _lane_matmul(a: jax.Array, b: jax.Array, *,
                 trans_b: bool = False) -> jax.Array:
    """Lane-major batched matmul: a, b [h, h, N] -> a @ b(^T) [h, h, N]."""
    h, _, n = a.shape
    nl = max(_LEAF_LANES // max(h // 32, 1) ** 2, 128)
    n_pad = ((n + nl - 1) // nl) * nl
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, n_pad - n)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, n_pad - n)))
    out = pl.pallas_call(
        functools.partial(_lane_matmul_kernel, h=h, trans_b=trans_b),
        grid=(n_pad // nl,),
        in_specs=[pl.BlockSpec((h, h, nl), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((h, h, nl), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, h, n_pad), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n_pad * h ** 3),
            bytes_accessed=int(3 * n_pad * h * h * 4),
            transcendentals=0,
        ),
    )(a, b)
    return out[:, :, :n]


# Below this block size the whole recursion runs in lane-major layout
# (one transpose in/out total; leaf + matmuls all lane-resident).
_LANE_MAX = 64


def _rec_lane(at: jax.Array, ridge: jax.Array) -> jax.Array:
    """Lane-major recursion: at [r, r, N] -> inv(chol(at + diag(ridge)))
    [r, r, N]; ridge [r, N] (per diagonal element)."""
    r = at.shape[0]
    if r <= _LEAF:
        return _leaf_lane(at, ridge)
    h = r // 2
    inv11 = _rec_lane(at[:h, :h, :], ridge[:h])
    # L21 = A21 @ inv(L11)^T ; S22 = A22 - L21 @ L21^T
    l21 = _lane_matmul(at[h:, :h, :], inv11, trans_b=True)
    s22 = at[h:, h:, :] - _lane_matmul(l21, l21, trans_b=True)
    inv22 = _rec_lane(s22, ridge[h:])
    # inv21 = -inv(L22) @ (L21 @ inv(L11))
    inv21 = -_lane_matmul(inv22, _lane_matmul(l21, inv11))
    zero = jnp.zeros_like(l21)
    return jnp.concatenate([
        jnp.concatenate([inv11, zero], axis=1),
        jnp.concatenate([inv21, inv22], axis=1),
    ], axis=0)


def _chol_inverse_leaf_impl(a: jax.Array, ridge: jax.Array) -> jax.Array:
    """Lane-major subtree: a [N, r, r], ridge [N, r] (per diagonal
    element) -> inv(chol(a + diag(ridge))), r <= _LANE_MAX."""
    n, r, _ = a.shape
    nl = _LEAF_LANES
    n_pad = ((n + nl - 1) // nl) * nl
    if n_pad != n:
        pad = jnp.broadcast_to(jnp.eye(r, dtype=a.dtype), (n_pad - n, r, r))
        a = jnp.concatenate([a, pad], axis=0)
        ridge = jnp.pad(ridge, ((0, n_pad - n), (0, 0)))
    at = jnp.transpose(a, (1, 2, 0))                            # [r, r, N]
    return jnp.transpose(_rec_lane(at, ridge.T), (2, 0, 1))[:n]


# A pallas_call is opaque to the SPMD partitioner, so the lane subtree is
# wrapped in custom_partitioning declaring it batch-parallel: each device
# runs the kernels on its local [N/devices, r, r] shard (the internal
# _LEAF_LANES padding happens per shard). Any sharding of the matrix
# dims is rejected back to replicated; the batch placement is preserved.
_chol_inverse_leaf = custom_partitioning(_chol_inverse_leaf_impl)


def _leaf_batch_axis(arg_shapes):
    sh = arg_shapes[0].sharding
    spec = sh.spec if sh is not None and sh.spec is not None else ()
    return spec[0] if len(spec) else None


def _leaf_partition(mesh, arg_shapes, result_shape):
    batch = _leaf_batch_axis(arg_shapes)
    sh = NamedSharding(mesh, PartitionSpec(batch, None, None))
    sh_r = NamedSharding(mesh, PartitionSpec(batch, None))
    return mesh, _chol_inverse_leaf_impl, sh, (sh, sh_r)


def _leaf_infer_sharding(mesh, arg_shapes, result_shape):
    batch = _leaf_batch_axis(arg_shapes)
    return NamedSharding(mesh, PartitionSpec(batch, None, None))


_chol_inverse_leaf.def_partition(
    partition=_leaf_partition,
    infer_sharding_from_operands=_leaf_infer_sharding,
    sharding_rule="n d e, n f -> n d e")


def _use_leaf_kernel() -> bool:
    if _interpret():
        return True
    return jax.default_backend() == "tpu"


def _chol_inverse_rec(a: jax.Array, ridge: jax.Array) -> jax.Array:
    """inv(chol(a + diag(ridge))) (lower-triangular) for SPD a [N, R, R],
    R a power of 2, ridge [N, R] (per diagonal element). The ridge is
    applied where each diagonal element is first consumed (leaf kernels
    / closed forms) — never as a slab-wide add."""
    n, r, _ = a.shape
    if r <= _LANE_MAX and r >= 8 and _use_leaf_kernel():
        return _chol_inverse_leaf(a, ridge)
    if r == 1:
        return jax.lax.rsqrt(
            jnp.maximum(a + ridge[:, :, None], 1e-30))
    if r == 2:
        a11 = a[:, 0:1, 0:1] + ridge[:, 0:1, None]
        a21 = a[:, 1:2, 0:1]
        a22 = a[:, 1:2, 1:2] + ridge[:, 1:2, None]
        i11 = jax.lax.rsqrt(jnp.maximum(a11, 1e-30))
        l21 = a21 * i11
        i22 = jax.lax.rsqrt(jnp.maximum(a22 - l21 * l21, 1e-30))
        i21 = -(i22 * l21 * i11)
        zero = jnp.zeros_like(a11)
        return jnp.concatenate([
            jnp.concatenate([i11, zero], axis=2),
            jnp.concatenate([i21, i22], axis=2),
        ], axis=1)
    h = r // 2
    inv11 = _chol_inverse_rec(a[:, :h, :h], ridge[:, :h])
    # L21 = A21 @ inv(L11)^T
    l21 = _bdot(a[:, h:, :h], inv11, (((2,), (2,))))
    # Schur complement S22 = A22 - L21 @ L21^T
    s22 = a[:, h:, h:] - _bdot(l21, l21, (((2,), (2,))))
    inv22 = _chol_inverse_rec(s22, ridge[:, h:])
    # inv21 = -inv(L22) @ (L21 @ inv(L11))
    t = _bdot(l21, inv11, (((2,), (1,))))
    inv21 = -_bdot(inv22, t, (((2,), (1,))))
    zero = jnp.zeros((n, h, h), a.dtype)
    return jnp.concatenate([
        jnp.concatenate([inv11, zero], axis=2),
        jnp.concatenate([inv21, inv22], axis=2),
    ], axis=1)


def _pad_pow2(a: jax.Array) -> jax.Array:
    """Pad [N, d, d] to the next power of two with identity blocks."""
    d = a.shape[1]
    d_pad = _next_pow2(d)
    if d_pad == d:
        return a
    pad_eye = jnp.zeros((d_pad, d_pad), a.dtype).at[
        jnp.arange(d, d_pad), jnp.arange(d, d_pad)].set(1.0)
    a = jnp.pad(a, ((0, 0), (0, d_pad - d), (0, d_pad - d)))
    return a + pad_eye[None]


def _ridge_vec(ridge, n: int, d: int, d_pad: int, dtype) -> jax.Array:
    """Normalize ridge (None | [N] | [N, d]) to [N, d_pad] (0 on pad)."""
    if ridge is None:
        return jnp.zeros((n, d_pad), dtype)
    ridge = jnp.asarray(ridge, dtype)
    if ridge.ndim == 1:
        ridge = jnp.broadcast_to(ridge[:, None], (n, d))
    if d_pad != d:
        ridge = jnp.pad(ridge, ((0, 0), (0, d_pad - d)))
    return ridge


@functools.partial(jax.jit, static_argnames=())
def chol_inverse(a: jax.Array, ridge: jax.Array = None) -> jax.Array:
    """inv(chol(a + diag(ridge))) for batched SPD a [N, d, d]
    (lower-triangular inverse); ridge None, [N] (scalar shift per
    system) or [N, d] (full diagonal shift).

    d is padded internally to the next power of two with identity blocks.
    """
    n, d, _ = a.shape
    d_pad = _next_pow2(d)
    ridge = _ridge_vec(ridge, n, d, d_pad, a.dtype)
    inv = _chol_inverse_rec(_pad_pow2(a), ridge)
    return inv[:, :d, :d]


# --------------------------------------------------------------------------
# Factored solve: Cholesky FACTOR + block substitution (d^3/3 FLOPs)
# --------------------------------------------------------------------------
#
# The explicit inverse costs ~3x the FLOPs of a factorization; with a
# single right-hand side per system (every solve in this framework) the
# substitution passes are memory-bound mul+reduce block matvecs — the
# same traffic as the two matvecs against the explicit inverse. The
# "solve factor" S stores, in one [N, d, d] buffer, the strictly-lower
# L21 blocks of the blocked Cholesky factor and — on the <=_LANE_MAX
# diagonal blocks — inv(chol(block)) from the lane-major Pallas subtree,
# so substitution never meets a triangular solve (XLA's lowering of
# which is the per-column-loop disaster this module exists to avoid).
#
# STATUS (round 3, resolved): DEFAULT on TPU for batches >= _FACTORED_MIN_N.
# The round-1 "factored-solve device hang" was root-caused on hardware to a
# transfer artifact, not the solver: a single >= 512 MB host->device
# jax.device_put over the tunneled v5e runtime never completes (a bare
# device_put of a 512 MB ones() hangs with no solver code anywhere), and
# the repro scripts were transferring the [N, d, d] operands from host.
# With on-device operands (how every model epoch builds its normal
# equations) both paths run at every shape. Measured steady-state on the
# v5e (scripts/ab_factored.py, 16-solve scan chains, dispatch floor
# subtracted):
#
#     [N, d]        explicit    factored
#     [2048, 128]   3.84 ms     2.98 ms   (1.29x)
#     [1024, 256]   6.76 ms     5.17 ms   (1.31x)
#     [ 256, 512]   6.42 ms     4.40 ms   (1.46x)
#     [  16, 512]   1.50 ms     1.67 ms   (0.90x)
#
# so the factorization's 3x FLOP saving is real at the hot shapes and
# only the tiny-batch tail prefers the explicit inverse (its two matvecs
# beat the substitution recursion's dispatch depth there) — hence the
# static batch-size gate. FRT_FACTORED_SOLVE=1/0 still forces the path
# unconditionally (the A/B and CPU-coverage hook).

_FACTORED_MIN_N = 64


def _use_factored() -> bool:
    """Forced factored path (env set to 1) — also overrides LAPACK."""
    return os.environ.get("FRT_FACTORED_SOLVE") == "1"


def _factored_for(n: int) -> bool:
    """Path choice for a batch of n systems (n is static under jit)."""
    env = os.environ.get("FRT_FACTORED_SOLVE")
    if env is not None:
        return env == "1"
    if _interpret() or jax.default_backend() == "tpu":
        return n >= _FACTORED_MIN_N
    return False


def _use_lapack() -> bool:
    """On the CPU backend XLA's cholesky/triangular_solve lower to LAPACK
    custom calls that beat the blocked inversion ~3x (measured 34.9 vs
    107.7 ms at [4096, 32, 32] on one core — the inversion's extra FLOPs
    and deep-recursion concatenates only pay off against the TPU's
    per-column-loop lowering). Interpret mode opts out so the CPU test
    mesh still exercises the TPU code path and its SPMD partitioning,
    and the explicit FRT_FACTORED_SOLVE opt-in takes precedence."""
    if _interpret() or _use_factored() or (
            os.environ.get("FRT_NO_LAPACK_SOLVE") == "1"):
        return False
    return jax.default_backend() == "cpu"


def _lapack_solve(a: jax.Array, b: jax.Array, ridge) -> jax.Array:
    """chol + two triangular solves; ridge None, [N] or [N, d]
    materialized as a diagonal add (a memory pass, but CPU-path only).

    All-zero systems are bumped to the identity; nonfinite rows are
    scrubbed by ``_scrub_nonfinite`` (shared with the blocked paths)."""
    d = a.shape[-1]
    if ridge is None:
        ridge = jnp.zeros((a.shape[0], 1), a.dtype)
    elif jnp.ndim(ridge) == 1:
        ridge = ridge[:, None]
    diag = jnp.einsum("ndd->nd", a) + ridge
    zero_bump = jnp.where(jnp.all(diag == 0.0, axis=-1), 1.0, 0.0)
    a = a + (ridge + zero_bump[:, None])[:, :, None] * jnp.eye(d, dtype=a.dtype)
    chol = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(chol, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)[..., 0]
    return _scrub_nonfinite(x)


def _scrub_nonfinite(x: jax.Array) -> jax.Array:
    """Zero any solution row that came back nonfinite.

    A rank-deficient system with a NONZERO diagonal (reachable with
    l2_reg=0 and history shorter than dim) defeats both the all-zero
    bump and the blocked path's per-pivot clamps (the clamped huge
    pivots feed inf - inf into the Schur complement), and LAPACK's
    potrf simply fails — every dispatch can produce NaN rows. A zero
    row (skip this row's update) is the one cheap answer that cannot
    poison the embedding table; genuinely bad numerics still surface
    through the models' NaN-loss abort (reference ials.h:291-296)."""
    ok = jnp.all(jnp.isfinite(x), axis=-1, keepdims=True)
    return jnp.where(ok, x, 0.0)


def _trsm_right(s: jax.Array, x: jax.Array) -> jax.Array:
    """x @ L^-T for the solve factor ``s`` [N, r, r]; x [N, m, r]."""
    r = s.shape[1]
    if r <= _LANE_MAX:
        return _bdot(x, s, (((2,), (2,))))        # x @ inv(L)^T
    h = r // 2
    y1 = _trsm_right(s[:, :h, :h], x[:, :, :h])
    rest = x[:, :, h:] - _bdot(y1, s[:, h:, :h], (((2,), (2,))))
    y2 = _trsm_right(s[:, h:, h:], rest)
    return jnp.concatenate([y1, y2], axis=2)


def _factor_rec(a: jax.Array, ridge: jax.Array) -> jax.Array:
    """Solve factor of a + diag(ridge): L21 blocks below the diagonal,
    inv(chol(.)) on the <=_LANE_MAX diagonal blocks."""
    n, r, _ = a.shape
    if r <= _LANE_MAX:
        return _chol_inverse_rec(a, ridge)   # diagonal-block terminal
    h = r // 2
    s11 = _factor_rec(a[:, :h, :h], ridge[:, :h])
    l21 = _trsm_right(s11, a[:, h:, :h])
    s22 = _factor_rec(a[:, h:, h:] - _bdot(l21, l21, (((2,), (2,)))),
                      ridge[:, h:])
    zero = jnp.zeros((n, h, h), a.dtype)
    return jnp.concatenate([
        jnp.concatenate([s11, zero], axis=2),
        jnp.concatenate([l21, s22], axis=2),
    ], axis=1)


def _fwd_sub(s: jax.Array, b: jax.Array) -> jax.Array:
    """y = L^-1 b by block forward substitution; b [N, r]."""
    r = s.shape[1]
    if r <= _LANE_MAX:
        return jnp.sum(s * b[:, None, :], axis=2)            # inv @ b
    h = r // 2
    y1 = _fwd_sub(s[:, :h, :h], b[:, :h])
    t = b[:, h:] - jnp.sum(s[:, h:, :h] * y1[:, None, :], axis=2)
    y2 = _fwd_sub(s[:, h:, h:], t)
    return jnp.concatenate([y1, y2], axis=1)


def _bwd_sub(s: jax.Array, y: jax.Array) -> jax.Array:
    """x = L^-T y by block backward substitution; y [N, r]."""
    r = s.shape[1]
    if r <= _LANE_MAX:
        return jnp.sum(s * y[:, :, None], axis=1)            # inv^T @ y
    h = r // 2
    x2 = _bwd_sub(s[:, h:, h:], y[:, h:])
    t = y[:, :h] - jnp.sum(s[:, h:, :h] * x2[:, :, None], axis=1)
    x1 = _bwd_sub(s[:, :h, :h], t)
    return jnp.concatenate([x1, x2], axis=1)


@jax.jit
def spd_solve(a: jax.Array, b: jax.Array,
              ridge: jax.Array = None) -> jax.Array:
    """Solve (a[n] + diag(ridge[n])) x = b[n] for batched SPD a
    [N, d, d], b [N, d] -> [N, d]; ridge None, [N] (scalar shift per
    system) or [N, d] (full diagonal shift).

    On TPU (and in interpret mode) batches of >= _FACTORED_MIN_N systems
    use the blocked Cholesky factorization + forward/backward
    substitution (3x fewer FLOPs, measured 1.3-1.5x faster at the hot
    shapes — see the factored-solve section above); smaller batches use
    x = inv(L)^T @ (inv(L) @ b) via the explicit blocked inverse.
    FRT_FACTORED_SOLVE=1/0 forces the choice either way (=1 also wins
    over the CPU dispatch below). On the CPU backend the solve
    dispatches to LAPACK instead (see ``_use_lapack``;
    FRT_NO_LAPACK_SOLVE=1 or FRT_FACTORED_SOLVE restores the blocked
    paths).
    Degenerate all-zero systems are bumped to the identity so the
    factorization stays finite; the zero test uses the RHS (for SPD a,
    b == 0 gives x == 0 with or without the bump, and a == 0 only arises
    on padded rows whose b is also 0). Rank-deficient systems that defeat
    the bump return zero rows instead of NaN (``_scrub_nonfinite``). Both the bump and the callers'
    reg * I ride the solver's lazy diagonal shift (see ``_leaf_kernel``)
    — applied assembly-side each was a full memory-bound pass over the
    [N, d, d] slabs.
    """
    n, d = b.shape
    bump = jnp.where(jnp.all(b == 0.0, axis=-1), 1.0, 0.0)
    if ridge is None:
        ridge = bump
    elif jnp.ndim(ridge) == 1:
        ridge = bump + ridge
    else:
        ridge = bump[:, None] + ridge
    if _use_lapack():
        return _lapack_solve(a, b, ridge)
    if not _factored_for(n):
        inv = chol_inverse(a, ridge)
        y = _bdot(inv, b[:, :, None], (((2,), (1,))))      # inv @ b
        x = _bdot(inv, y, (((1,), (1,))))                  # inv^T @ y
        return _scrub_nonfinite(x[:, :, 0])
    d_pad = _next_pow2(d)
    ridge = _ridge_vec(ridge, n, d, d_pad, a.dtype)
    if d_pad != d:
        a = _pad_pow2(a)
        b = jnp.pad(b, ((0, 0), (0, d_pad - d)))
    s = _factor_rec(a, ridge)
    x = _bwd_sub(s, _fwd_sub(s, b))
    return _scrub_nonfinite(x[:, :d])
