"""Compare XLA batched small-matmul vs in-kernel (Pallas/Mosaic) rate.

The solver's mid-level dots ([N, 32..128, same] batched matmuls) run far
below the MXU roofline in XLA. Is an in-VMEM Mosaic batched dot faster?
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def fetch_time(f, *args, reps=3):
    float(jnp.sum(f(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def pallas_bdot(x, bn, n_dots, precision):
    n, h, _ = x.shape

    def kernel(x_ref, o_ref):
        acc = x_ref[:]
        for _ in range(n_dots):
            acc = jax.lax.dot_general(
                acc, x_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=precision) * 1e-2
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((bn, h, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, h, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, h), jnp.float32),
    )(x)


def xla_bdot(x, n_dots, precision):
    acc = x
    for _ in range(n_dots):
        acc = jax.lax.dot_general(
            acc, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision) * 1e-2
    return acc


N = 4096
NDOTS = 8
for h in (32, 64, 128):
    x = jax.random.normal(key, (N, h, h), jnp.float32) * 0.1
    flops = 2 * N * h ** 3 * NDOTS
    for pname in ("DEFAULT", "HIGHEST"):
        prec = getattr(jax.lax.Precision, pname)
        t_x = fetch_time(jax.jit(functools.partial(
            xla_bdot, n_dots=NDOTS, precision=prec)), x)
        bn = min(N, max(8, (1 << 20) // (4 * h * h)))
        t_p = fetch_time(jax.jit(functools.partial(
            pallas_bdot, bn=bn, n_dots=NDOTS, precision=prec)), x)
        print(f"h={h:4d} {pname:8s} xla={t_x*1e3:7.2f} ms "
              f"({flops/t_x/1e12:5.1f} TF/s)   "
              f"pallas(bn={bn})={t_p*1e3:7.2f} ms ({flops/t_p/1e12:5.1f} TF/s)")
