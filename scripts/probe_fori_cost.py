"""Measure per-iteration cost of a Pallas fori_loop on VMEM-resident data."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(shape, k, npasses):
    def kernel(x_ref, o_ref):
        def step(j, x):
            for _ in range(npasses):
                x = x * 1.000001 + 1e-9
            return x
        o_ref[:] = jax.lax.fori_loop(0, k, step, x_ref[:])
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    return f, x


def fetch_time(f, x, reps=3):
    float(jnp.sum(f(x)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        best = min(best, time.perf_counter() - t0)
    return best


for shape in [(128, 32, 32), (512, 8, 128), (256, 16, 128)]:
    for npasses in (1, 6):
        f1, x = make(shape, 64, npasses)
        f2, _ = make(shape, 1024, npasses)
        t1, t2 = fetch_time(f1, x), fetch_time(f2, x)
        per = (t2 - t1) / (1024 - 64) * 1e6
        print(f"shape={shape} passes={npasses}: {per:.2f} us/step")
