"""Bisect which kernel pattern crashes Mosaic."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN, R = 8, 64
WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"


def run(name, kernel, scratch=()):
    a = jnp.eye(R)[None] * 2.0 + jnp.ones((BN, R, R)) * 0.01
    try:
        o = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BN, R, R), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )(a)
        o.block_until_ready()
        print(f"{name}: ok sum={float(o.sum()):.3f}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:150]}")


def onehot_row(j, r):
    return (jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == j).astype(
        jnp.float32)


def k_cholstep(a_ref, o_ref):
    def chol_step(j, blk):
        oh_r = onehot_row(j, R)
        oh_c = oh_r.reshape(1, R)
        piv = jnp.sum(blk * oh_r[None] * oh_c[None], axis=(1, 2),
                      keepdims=True)
        inv_piv = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))
        col = jnp.sum(blk * oh_c[None], axis=2, keepdims=True)
        below = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                 >= j).astype(jnp.float32)
        col = col * inv_piv * below[None]
        upd_cols = (jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                    > j).astype(jnp.float32)
        upd = col * col.reshape(col.shape[0], 1, R) * upd_cols[None]
        blk = blk - upd
        blk = blk * (1.0 - oh_c[None]) + col * oh_c[None]
        return blk
    o_ref[:] = jax.lax.fori_loop(0, R, chol_step, a_ref[:])


def k_invstep(a_ref, o_ref):
    blk = a_ref[:]
    row_lt = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
              > jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
              ).astype(jnp.float32)
    eye_r = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
             ).astype(jnp.float32)
    lpp_strict = blk * row_lt[None]
    diag = jnp.sum(blk * eye_r[None], axis=2)

    def bdot(lhs, rhs, contract):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=((contract), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def inv_step(j, inv):
        oh_r = onehot_row(j, R)
        lrow = jnp.sum(lpp_strict * oh_r[None, :, :], axis=1, keepdims=True)
        prod = bdot(lrow, inv, (((2,), (1,))))
        piv = jnp.sum(diag * oh_r.reshape(1, R), axis=1,
                      keepdims=True)[:, :, None]
        row = (oh_r.reshape(1, 1, R) - prod) / piv
        keep = 1.0 - oh_r.reshape(1, R, 1)
        return inv * keep + row * oh_r.reshape(1, R, 1)

    o_ref[:] = jax.lax.fori_loop(0, R, inv_step, jnp.zeros_like(blk))


def k_subst(a_ref, o_ref, y_ref):
    def bdot(lhs, rhs, contract):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=((contract), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    half = R // 2
    y_ref[:, :half] = jnp.ones((BN, half), jnp.float32)
    rhs = y_ref[:, :half][:, None, :]
    out = bdot(rhs, a_ref[:, :half, :half], (((2,), (2,))))[:, 0, :]
    y_ref[:, half:] = out
    o_ref[:] = y_ref[:][:, :, None] * jnp.ones((1, 1, R))


if WHICH in ("all", "chol"):
    run("chol_step loop", k_cholstep)
if WHICH in ("all", "inv"):
    run("inv_step loop", k_invstep)
if WHICH in ("all", "subst"):
    run("substitution ops", k_subst,
        scratch=(pltpu.VMEM((BN, R), jnp.float32),))
