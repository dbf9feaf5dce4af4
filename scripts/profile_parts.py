"""Split step_u time into assembly vs solve at a given dim."""
import sys
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu import Config, Dataset, DeviceData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.ops import assemble, solve

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ML1M = "/root/reference/tests/ml-1m"
train = Dataset.from_csv(f"{ML1M}/train.csv")
dd = DeviceData.build(train)

key = jax.random.PRNGKey(0)
v = jax.random.normal(key, (train.num_items, DIM), jnp.float32) * 0.01
gram = v.T @ v
dual = jnp.full((train.num_users,), 0.3, jnp.float32)
reg = 0.004 * (1.0 + 0.004 * train.num_items)


def assemble_all(v, gram, dual):
    out = []
    for b in dd.by_user:
        w = dual[jnp.minimum(b.row_ids, dual.shape[0] - 1)]
        a, rhs = common.assemble_weighted_mean(
            v, gram, b, jnp.full((b.n_rows,), reg, jnp.float32), 0.004, w)
        out.append((a, rhs))
    return out


def solve_all(systems):
    return [solve.cholesky_solve(a, rhs) for a, rhs in systems]


def gather_only(v):
    out = []
    for b in dd.by_user:
        emb, mask = assemble.gather_history(v, b)
        out.append(emb.sum())
    return jnp.stack(out)


def gram_only(v):
    out = []
    for b in dd.by_user:
        emb, _ = assemble.gather_history(v, b)
        out.append(assemble.row_gramians(emb).sum())
    return jnp.stack(out)


def gram_bf16(v):
    out = []
    for b in dd.by_user:
        emb, _ = assemble.gather_history(v, b, dtype=jnp.bfloat16)
        out.append(assemble.row_gramians(emb).sum())
    return jnp.stack(out)


j_asm = jax.jit(assemble_all)
j_all = jax.jit(lambda v, g, z: [x.sum() for x in solve_all(assemble_all(v, g, z))])
j_gather = jax.jit(gather_only)
j_gram = jax.jit(gram_only)
j_gram16 = jax.jit(gram_bf16)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    print(f"{name:22s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms")
    return out


timeit("gather only", j_gather, v)
timeit("gather+gramian f32", j_gram, v)
timeit("gather+gramian bf16", j_gram16, v)
timeit("assemble (a,rhs)", j_asm, v, gram, dual)
timeit("assemble+solve", j_all, v, gram, dual)

# --- deeper: pre-materialize systems, time solve alone per bucket sizes
systems = jax.block_until_ready(j_asm(v, gram, dual))
j_solve = jax.jit(lambda ss: [solve.cholesky_solve(a, rhs).sum() for a, rhs in ss])
timeit("solve alone (9 buckets)", j_solve, systems)

import jax.numpy as jnp
for (a, rhs) in systems:
    f = jax.jit(lambda a, r: solve.cholesky_solve(a, r).sum())
    out = jax.block_until_ready(f(a, rhs))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(f(a, rhs))
    print(f"  solve N={a.shape[0]:5d} d={a.shape[1]}  {(time.perf_counter()-t0)/5*1e3:8.1f} ms")
