"""Isolate why cholesky_solve is slow on real assembled systems."""
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu import Config, Dataset, DeviceData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.ops import solve

DIM = 256
ML1M = "/root/reference/tests/ml-1m"
train = Dataset.from_csv(f"{ML1M}/train.csv")
dd = DeviceData.build(train)
key = jax.random.PRNGKey(0)
v = jax.random.normal(key, (train.num_items, DIM), jnp.float32) * 0.01
gram = v.T @ v
dual = jnp.full((train.num_users,), 0.3, jnp.float32)
reg = 0.004 * (1.0 + 0.004 * train.num_items)

b = dd.by_user[4]  # N=928 L=128
w = dual[jnp.minimum(b.row_ids, dual.shape[0] - 1)]
a, rhs = jax.jit(lambda v, g, w: common.assemble_weighted_mean(
    v, g, b, jnp.full((b.n_rows,), reg, jnp.float32), 0.004, w))(v, gram, w)
a = jax.block_until_ready(a)
print("a stats: min|diag|", float(jnp.abs(jnp.einsum('ndd->nd', a)).min()),
      "max", float(a.max()), "min", float(a.min()),
      "nan", bool(jnp.isnan(a).any()))


def timeit(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:30s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms")
    return out


l_real = timeit("chol(real a)", jnp.linalg.cholesky, a)
timeit("trisolve fwd (real)", lambda l, r: jax.scipy.linalg.solve_triangular(
    l, r[..., None], lower=True), l_real, rhs)
timeit("trisolve bwd (real)", lambda l, r: jax.scipy.linalg.solve_triangular(
    l, r[..., None], lower=True, trans=1), l_real, rhs)
timeit("full cholesky_solve (real)", solve.cholesky_solve, a, rhs)

# synthetic same-shape, well-scaled
m = jax.random.normal(key, a.shape, jnp.float32)
a2 = jnp.einsum("nij,nkj->nik", m, m) + 10.0 * jnp.eye(DIM)
timeit("chol(synthetic)", jnp.linalg.cholesky, a2)
timeit("full cholesky_solve (synth)", solve.cholesky_solve, a2, rhs)

# scaled-up real (denormal check): multiply a by 1e4
timeit("chol(real*1e4)", jnp.linalg.cholesky, a * 1e4)
# real with bigger ridge
timeit("chol(real + I)", jnp.linalg.cholesky, a + jnp.eye(DIM))
