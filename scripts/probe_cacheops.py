"""Microbench: prediction-cache gather/scatter variants on the real TPU.

Times one full by-user pass (all buckets) for each variant, chained
k times on device via lax.scan with a trailing scalar fetch (the only
reliable barrier on the axon tunnel).
"""
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu import Dataset, DeviceData
from safer2_recommender_tpu.ops import assemble

ML1M = "/root/reference/tests/ml-1m"
train = Dataset.from_csv(f"{ML1M}/train.csv")
dd = DeviceData.build(train, dim=32)
pred = assemble.pred_buffer(dd.pred_size) + 0.5
masks = [assemble.history_mask(b) for b in dd.by_user]
vals = [m * 0.25 for m in masks]


def chain(f, k):
    def body(p, _):
        return f(p), None
    return jax.jit(lambda p: jax.lax.scan(body, p, None, length=k)[0])


def timeit(name, f):
    ks = (8, 64)
    ts = []
    for k in ks:
        g = chain(f, k)
        float(jnp.sum(g(pred)))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(g(pred)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    per = (ts[1] - ts[0]) / (ks[1] - ks[0])
    print(f"{name:28s} {per*1e6:9.1f} us/pass")


def gather_elem(p):
    acc = 0.0
    for b, m in zip(dd.by_user, masks):
        acc = acc + jnp.sum(assemble.gather_pred(p, b, m))
    return p + acc * 1e-9


def gather_win(p):
    acc = 0.0
    for b, m in zip(dd.by_user, masks):
        acc = acc + jnp.sum(assemble.gather_pred(p, b, m, contiguous=True))
    return p + acc * 1e-9


def scat_add_elem(p):
    for b, v in zip(dd.by_user, vals):
        p = assemble.scatter_pred_update(p, b, v, add=True)
    return p


def scat_add_win(p):
    for b, v in zip(dd.by_user, vals):
        p = assemble.scatter_pred_update(p, b, v, add=True,
                                         contiguous=True)
    return p


def scat_set_elem(p):
    for b, v in zip(dd.by_user, vals):
        p = assemble.scatter_pred_update(p, b, v, add=False)
    return p


print(f"nnz={dd.nnz} buckets={[(b.n_rows, b.width) for b in dd.by_user]}")
timeit("gather element", gather_elem)
timeit("gather window", gather_win)
timeit("scatter-add element", scat_add_elem)
timeit("scatter-add window", scat_add_win)
timeit("scatter-set element", scat_set_elem)
