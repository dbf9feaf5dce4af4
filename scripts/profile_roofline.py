"""Reliable timing: K dependent reps inside one jit + scalar fetch.

per-op time = (t(K2) - t(K1)) / (K2 - K1)  — fetch latency cancels.
"""
import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)


def fetch_time(fn, args, reps=3):
    f = jax.jit(fn)
    float(f(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def k_reps(op, x0, k):
    def fn(x):
        def body(x, _):
            return op(x), None
        out, _ = jax.lax.scan(body, x, None, length=k)
        return out.sum()
    return fn


def measure(name, op, x0, k1, k2, flops_per_op):
    t1 = fetch_time(k_reps(op, x0, k1), (x0,))
    t2 = fetch_time(k_reps(op, x0, k2), (x0,))
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:32s} {per*1e3:8.2f} ms/op  "
          f"{flops_per_op/per/1e12:7.2f} TFLOP/s   "
          f"(t{k1}={t1*1e3:.1f}ms t{k2}={t2*1e3:.1f}ms)")


# base fetch latency
print(f"fetch latency: {fetch_time(lambda x: x.sum(), (jnp.ones(8),))*1e3:.1f} ms")

d = 4096
m = jax.random.normal(key, (d, d), jnp.float32) * 0.01
measure("matmul 4096 f32", lambda x: x @ m + 1e-6, m, 2, 12, 2 * d**3)
mb = (jax.random.normal(key, (d, d), jnp.bfloat16) * 0.01)
measure("matmul 4096 bf16",
        lambda x: jnp.dot(x, mb, preferred_element_type=jnp.bfloat16) + 1e-2,
        mb, 2, 12, 2 * d**3)

n, dc = 928, 256
g = jax.random.normal(key, (n, dc, dc), jnp.float32)
a = jnp.einsum("nij,nkj->nik", g, g) + 10.0 * jnp.eye(dc)
eye = jnp.eye(dc)
measure("chol [928,256,256]",
        lambda x: jnp.einsum("nij,nkj->nik",
                             jnp.linalg.cholesky(x), jnp.linalg.cholesky(x))
        + eye, a, 1, 5, 2 * (n * dc**3 / 3))

b0 = jax.random.normal(key, (n, dc, 1), jnp.float32)
l = jnp.linalg.cholesky(a)
measure("trisolve [928,256]",
        lambda x: jax.scipy.linalg.solve_triangular(l, x, lower=True) + 1.0,
        b0, 2, 20, n * dc**2)
