"""Attribute spd_solve time: chol_inverse kernel vs trailing vs substitution."""
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.ops import pallas_solve

key = jax.random.PRNGKey(0)
N, D = 4096, 256
R = pallas_solve._panel_width(D)
NB = D // R
print(f"panel r={R} nb={NB} bn={pallas_solve._block_batch(R)}")

g = jax.random.normal(key, (N, D, D), jnp.float32)
a = jnp.einsum("nij,nkj->nik", g, g) / D + 0.01 * jnp.eye(D)
b = jax.random.normal(key, (N, D), jnp.float32)
blocks = a[:, :R, :R]


def fetch_time(f, *args, reps=3):
    float(jnp.sum(f(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


base = fetch_time(jax.jit(lambda a, b: b.sum() + a[0, 0, 0]), a, b)
print(f"base fetch: {base*1e3:.1f} ms")

# 1. chol_inverse alone, NB sequential calls (as in the real factorization)
def chol_nb(a):
    out = 0.0
    blk = a[:, :R, :R]
    for i in range(NB):
        inv = pallas_solve.chol_inverse(blk + out * jnp.eye(R))
        out = out + inv.sum() * 1e-20
    return out
t = fetch_time(jax.jit(chol_nb), a) - base
print(f"chol_inverse x{NB}: {t*1e3:.1f} ms")

# 2. trailing updates alone (shapes as in real factorization)
def trailing(a):
    trail = a
    acc = 0.0
    for p in range(NB):
        if trail.shape[1] > R:
            below = pallas_solve._bdot(trail[:, R:, :R],
                                       trail[:, :R, :R], (((2,), (2,))))
            trail = trail[:, R:, R:] - pallas_solve._bdot(
                below, below, (((2,), (2,))))
        acc = acc + trail.sum() * 1e-30
    return acc
t = fetch_time(jax.jit(trailing), a) - base
print(f"trailing updates: {t*1e3:.1f} ms")

# 2b. trailing updates at DEFAULT precision
def trailing_fast(a):
    trail = a
    acc = 0.0
    for p in range(NB):
        if trail.shape[1] > R:
            below = jax.lax.dot_general(
                trail[:, R:, :R], trail[:, :R, :R],
                dimension_numbers=((((2,), (2,))), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            trail = trail[:, R:, R:] - jax.lax.dot_general(
                below, below,
                dimension_numbers=((((2,), (2,))), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        acc = acc + trail.sum() * 1e-30
    return acc
t = fetch_time(jax.jit(trailing_fast), a) - base
print(f"trailing (bf16 default): {t*1e3:.1f} ms")

# 3. full solve
t = fetch_time(jax.jit(lambda a, b: pallas_solve.spd_solve(a, b)), a, b) - base
print(f"full spd_solve: {t*1e3:.1f} ms")

# 4. substitutions = full - (1) - (2) roughly
