"""Bisect chol_step internals."""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN, R = 8, 64
WHICH = sys.argv[1]


def run(name, kernel, out_shape=(BN, R, R)):
    a = jnp.eye(R)[None] * 2.0 + jnp.ones((BN, R, R)) * 0.01
    try:
        o = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a)
        o.block_until_ready()
        print(f"{name}: ok sum={float(o.sum()):.3f}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}")


def oh(j, r):
    return (jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == j).astype(
        jnp.float32)


if WHICH == "reduce2":
    # two-axis keepdims reduction inside fori
    def k(a_ref, o_ref):
        def step(j, blk):
            o_r = oh(j, R)
            piv = jnp.sum(blk * o_r[None] * o_r.reshape(1, R)[None],
                          axis=(1, 2), keepdims=True)
            return blk + piv * 0.0
        o_ref[:] = jax.lax.fori_loop(0, R, step, a_ref[:])
    run("reduce2 keepdims in fori", k)

if WHICH == "reshape":
    # [BN,R,1] -> [BN,1,R] reshape inside fori
    def k(a_ref, o_ref):
        def step(j, blk):
            col = jnp.sum(blk * oh(j, R).reshape(1, R)[None], axis=2,
                          keepdims=True)        # [BN, R, 1]
            colr = col.reshape(BN, 1, R)
            return blk + col * colr * 0.0
        o_ref[:] = jax.lax.fori_loop(0, R, step, a_ref[:])
    run("reshape col in fori", k)

if WHICH == "reshape_nofori":
    def k(a_ref, o_ref):
        col = jnp.sum(a_ref[:], axis=2, keepdims=True)
        o_ref[:] = col.reshape(BN, 1, R) * col
    run("reshape col no fori", k)

if WHICH == "rsqrt":
    def k(a_ref, o_ref):
        def step(j, blk):
            piv = jnp.sum(blk * oh(j, R)[None], axis=1, keepdims=True)
            return blk * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(piv, axis=2, keepdims=True), 1e-30))
        o_ref[:] = jax.lax.fori_loop(0, R, step, a_ref[:])
    run("rsqrt chain in fori", k)
