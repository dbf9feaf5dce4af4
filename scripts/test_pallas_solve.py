"""Validate + benchmark the Pallas SPD solve against XLA on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from safer2_recommender_tpu.ops import block_chol as pallas_solve
from safer2_recommender_tpu.ops import solve

key = jax.random.PRNGKey(0)


def make(n, d, cond=100.0):
    k1, k2 = jax.random.split(jax.random.fold_in(key, n * 1000 + d))
    g = jax.random.normal(k1, (n, d, d), jnp.float32)
    a = jnp.einsum("nij,nkj->nik", g, g) / d + (1.0 / cond) * jnp.eye(d)
    b = jax.random.normal(k2, (n, d), jnp.float32)
    return a, b


def fetch_time(f, *args, reps=3):
    float(jnp.sum(f(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


for (n, d) in [(8, 8), (40, 32), (928, 64), (928, 128), (928, 256),
               (4096, 256), (1024, 512), (16, 100)]:
    a, b = make(n, d)
    x_ref = jax.jit(solve.cholesky_solve)(a, b)
    x_pl = pallas_solve.spd_solve(a, b)
    err = float(jnp.max(jnp.abs(x_pl - x_ref)) /
                (jnp.max(jnp.abs(x_ref)) + 1e-30))
    # residual check (more meaningful than vs-XLA diff)
    res = jnp.einsum("nde,ne->nd", a, x_pl,
                     precision=jax.lax.Precision.HIGHEST) - b
    rres = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    ok = "OK " if (err < 5e-3 and rres < 1e-4) else "FAIL"
    print(f"{ok} N={n:5d} d={d:4d} relerr_vs_xla={err:.2e} relres={rres:.2e}")

# zero (padded) rows don't nan
a, b = make(64, 128)
a = a.at[3].set(0.0)
x = pallas_solve.spd_solve(a, b)
print("zero-row finite:", bool(jnp.isfinite(x).all()))

# perf
print("\nperf (fetch-latency cancelled):")
for (n, d) in [(4096, 32), (4096, 128), (4096, 256), (1024, 512)]:
    a, b = make(n, d)
    f_pl = jax.jit(lambda a, b: pallas_solve.spd_solve(a, b))
    f_xla = jax.jit(solve.cholesky_solve)
    base = fetch_time(jax.jit(lambda a, b: b.sum() + a[0, 0, 0]), a, b)
    t_pl = fetch_time(f_pl, a, b) - base
    t_xla = fetch_time(f_xla, a, b) - base
    fl = n * d**3 / 3
    print(f"N={n:5d} d={d:4d}  pallas={t_pl*1e3:7.1f} ms ({fl/t_pl/1e12:5.1f} TF/s)"
          f"  xla={t_xla*1e3:8.1f} ms  speedup={t_xla/t_pl:6.1f}x")
