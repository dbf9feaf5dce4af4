"""Probe: does Pallas compile/run on this backend? batched dot in-kernel?"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("platform:", jax.devices()[0].platform, jax.devices()[0])


def k_simple(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
y = pl.pallas_call(
    k_simple,
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
print("simple kernel ok:", bool((y == 2 * x).all()))


def k_bdot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


a = jnp.ones((4, 128, 64), jnp.float32)
b = jnp.ones((4, 64, 128), jnp.float32)
try:
    o = pl.pallas_call(
        k_bdot,
        out_shape=jax.ShapeDtypeStruct((4, 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    print("batched dot ok:", bool((o == 64.0).all()))
except Exception as e:
    print("batched dot FAILED:", type(e).__name__, str(e)[:200])


def k_2dot(a_ref, b_ref, o_ref):
    for i in range(4):
        o_ref[i] = jnp.dot(a_ref[i], b_ref[i],
                           preferred_element_type=jnp.float32)


try:
    o = pl.pallas_call(
        k_2dot,
        out_shape=jax.ShapeDtypeStruct((4, 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    print("looped 2d dot ok:", bool((o == 64.0).all()))
except Exception as e:
    print("looped 2d dot FAILED:", type(e).__name__, str(e)[:200])

# dynamic_slice on a value + fori_loop inside kernel
def k_dyn(x_ref, o_ref):
    def body(j, acc):
        col = jax.lax.dynamic_slice(x_ref[:], (0, j), (8, 1))
        return acc + col * col
    acc = jax.lax.fori_loop(0, 128, body, jnp.zeros((8, 1), jnp.float32))
    o_ref[:] = acc


try:
    o = pl.pallas_call(
        k_dyn,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    import numpy as np
    ref = (np.asarray(x) ** 2).sum(1, keepdims=True)
    print("fori+dynslice ok:", bool(jnp.allclose(o, ref)))
except Exception as e:
    print("fori+dynslice FAILED:", type(e).__name__, str(e)[:200])

# rsqrt/sqrt in kernel
def k_math(x_ref, o_ref):
    o_ref[:] = jax.lax.rsqrt(x_ref[:] + 1.0)


o = pl.pallas_call(
    k_math,
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
print("rsqrt ok:", bool(jnp.allclose(o, jax.lax.rsqrt(x + 1.0))))
