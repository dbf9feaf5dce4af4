"""Calibrate dispatch latency + roofline through the axon tunnel."""
import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)


def timeit(name, fn, args_list, flops=0):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for args in args_list:
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / len(args_list)
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:30s} {dt*1e3:8.2f} ms   {tf:6.1f} TFLOP/s")


# 1. tiny op: dispatch latency floor
x = jnp.ones((8, 8))
timeit("tiny add x20", lambda x: x + 1, [(x + i,) for i in range(20)])

# 2. big matmul roofline: 4096^3 *2 = 137 GFLOP
m = jax.random.normal(key, (4096, 4096), jnp.float32)
timeit("matmul 4096^3 f32 x10", lambda a, b: a @ b,
       [(m + i, m) for i in range(10)], flops=2 * 4096**3)
mb = m.astype(jnp.bfloat16)
timeit("matmul 4096^3 bf16 x10",
       lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
       [(mb + i, mb) for i in range(10)], flops=2 * 4096**3)

# 3. batched cholesky, varied inputs (no result caching possible)
n, d = 928, 256
g = jax.random.normal(key, (n, d, d), jnp.float32)
a = jnp.einsum("nij,nkj->nik", g, g) + 10.0 * jnp.eye(d)
timeit("chol [928,256,256] x10", jnp.linalg.cholesky,
       [(a + i * jnp.eye(d),) for i in range(10)],
       flops=n * d**3 / 3)

# 4. chained chol inside one jit (like the epoch): 9 calls
def chain(a):
    out = 0.0
    for i in range(9):
        out = out + jnp.linalg.cholesky(a + (i + out) * jnp.eye(d)).sum()
    return out
timeit("chol chain x9 in one jit", chain, [(a + i,) for i in range(5)],
       flops=9 * n * d**3 / 3)

# 5. batched trisolve chained
l = jnp.linalg.cholesky(a)
b = jax.random.normal(key, (n, d, 1), jnp.float32)
def tri_chain(l, b):
    out = b
    for _ in range(9):
        out = jax.scipy.linalg.solve_triangular(l, out, lower=True)
    return out
timeit("trisolve chain x9 one jit", tri_chain, [(l, b + i) for i in range(5)])
