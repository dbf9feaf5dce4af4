"""Serialized (data-dependent) timing — pipelining cannot hide compute."""
import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
d = 4096
m = jax.random.normal(key, (d, d), jnp.float32)
mm = jax.jit(lambda a, b: a @ b)

# warmup
out = jax.block_until_ready(mm(m, m))

# single call, full sync
t0 = time.perf_counter()
out = jax.block_until_ready(mm(m, m))
t1 = time.perf_counter()
print(f"single matmul sync: {(t1-t0)*1e3:.2f} ms "
      f"({2*d**3/(t1-t0)/1e12:.1f} TFLOP/s)")

# chained: x = x @ m, 10 times, dependent
x = m
t0 = time.perf_counter()
for _ in range(10):
    x = mm(x, m)
x = jax.block_until_ready(x)
t1 = time.perf_counter()
print(f"chained 10 matmuls: {(t1-t0)/10*1e3:.2f} ms/call "
      f"({2*d**3*10/(t1-t0)/1e12:.1f} TFLOP/s)")

# device_get forces a real transfer of a scalar
s = jax.jit(lambda a: (a @ a).sum())
jax.block_until_ready(s(m))
t0 = time.perf_counter()
for i in range(5):
    val = float(s(m + i))
t1 = time.perf_counter()
print(f"matmul + scalar fetch: {(t1-t0)/5*1e3:.2f} ms/call "
      f"({2*d**3/((t1-t0)/5)/1e12:.1f} TFLOP/s)")

# chained cholesky with value fetch
n, dd_ = 928, 256
g = jax.random.normal(key, (n, dd_, dd_), jnp.float32)
a = jnp.einsum("nij,nkj->nik", g, g) + 10.0 * jnp.eye(dd_)
cs = jax.jit(lambda a: jnp.linalg.cholesky(a).sum())
float(cs(a))
t0 = time.perf_counter()
for i in range(5):
    val = float(cs(a + i * jnp.eye(dd_)))
t1 = time.perf_counter()
flops = n * dd_**3 / 3
print(f"chol [928,256] + fetch: {(t1-t0)/5*1e3:.2f} ms/call "
      f"({flops/((t1-t0)/5)/1e12:.2f} TFLOP/s)")
