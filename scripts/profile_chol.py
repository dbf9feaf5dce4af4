"""Time XLA batched cholesky / triangular_solve at [N, d, d]."""
import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
D = int(sys.argv[2]) if len(sys.argv) > 2 else 256

key = jax.random.PRNGKey(0)
m = jax.random.normal(key, (N, D, D), jnp.float32)
a = jnp.einsum("nij,nkj->nik", m, m) + 10.0 * jnp.eye(D)
b = jax.random.normal(key, (N, D), jnp.float32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms")
    return out


chol = timeit("cholesky", jax.jit(jnp.linalg.cholesky), a)
timeit("tri_solve fwd", jax.jit(lambda l, b: jax.scipy.linalg.solve_triangular(
    l, b[..., None], lower=True)), chol, b)
timeit("jnp.linalg.solve", jax.jit(jnp.linalg.solve), a, b[..., None])
timeit("inv@b", jax.jit(lambda a, b: jnp.linalg.inv(a) @ b[..., None]), a, b)
