"""Microbench: embedding-row gather variants on the real TPU.

The history gather (table[col_ids] for [N, L] ids into a [M, d] table)
is >50% of small-dim epochs. Questions: does index ORDER matter (HBM
locality)? Does row WIDTH matter (lane utilization)? dtype?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 4096          # table rows
SLOTS = 1 << 19   # gathered slots (~571k in ML-1M epochs)


def chain(f, x, ids, k):
    def body(c, _):
        return f(c, ids), None
    return jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])


def timeit(name, f, x, ids, useful_bytes):
    ks = (4, 32)
    ts = []
    for k in ks:
        g = chain(f, x, ids, k)
        float(jnp.sum(g(x)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(g(x)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / (ks[1] - ks[0])
    bw = useful_bytes / per / 1e9
    print(f"{name:44s} {per*1e6:9.1f} us  useful {bw:7.1f} GB/s")


rng = np.random.default_rng(0)
# zipf-ish popularity like real histories
p = 1.0 / (np.arange(1, M + 1) ** 0.8)
p /= p.sum()
ids_rand = rng.choice(M, size=SLOTS, p=p).astype(np.int32)
ids_sorted_rows = ids_rand.reshape(-1, 128).copy()
ids_sorted_rows.sort(axis=1)   # sorted within each row (bucket-row analog)
ids_sorted = np.sort(ids_rand)

for d, dt in [(32, jnp.float32), (32, jnp.bfloat16), (128, jnp.float32),
              (128, jnp.bfloat16), (256, jnp.bfloat16)]:
    tbl = jnp.asarray(rng.normal(size=(M, d)), dtype=dt)
    nbytes = SLOTS * d * tbl.dtype.itemsize

    def g(c, ids):
        # tie ids to the carry so XLA cannot hoist the gather out of the
        # timing loop (always adds 0)
        tok = (c[0] == jnp.inf).astype(jnp.int32)
        out = tbl[ids + tok]
        return c + 1e-12 * jnp.sum(out, axis=0).astype(c.dtype)

    for label, ids in [("random", ids_rand),
                       ("row-sorted", ids_sorted_rows.reshape(-1)),
                       ("fully-sorted", ids_sorted)]:
        x = jnp.zeros((d,), dtype=jnp.float32)
        timeit(f"d={d} {dt.__name__:9s} {label}", g, x,
               jnp.asarray(ids), nbytes)
