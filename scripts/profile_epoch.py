"""Ad-hoc profiling: per-phase epoch breakdown for SAFER2 at large dim.

Usage: python scripts/profile_epoch.py [dim] [trace]
Writes a jax.profiler trace to /tmp/jaxtrace when 'trace' is passed.
"""
import sys
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TRACE = len(sys.argv) > 2

ML1M = "/root/reference/tests/ml-1m"
train = Dataset.from_csv(f"{ML1M}/train.csv")
dd = DeviceData.build(train)
cfg = Config(dim=DIM, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
             bandwidth=0.15, xi_iterations=5, pd_iterations=1)
model = get_model("safer2", cfg, train.num_users, train.num_items)
model.initialize(dd)

# warmup/compile
for _ in range(2):
    model.train_epoch(dd)

# timed phases
st = model.state
ue, ie = st.user_emb, st.item_emb
gram, loss, dual = st.item_gramian, st.user_loss, st.dual_weight

step_u = jax.jit(lambda u, v, g, z: model._step_u(u, v, g, dd.by_user, z))
step_v = jax.jit(lambda v, u, z: model._step_v(v, u, dd, z))
from safer2_recommender_tpu.models import common
losses = jax.jit(lambda u, v, g: common.user_losses(
    u, v, g, dd.by_user, dd.num_users, cfg.uobs_weight, halve=True))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))   # compile
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:12s} {dt:8.1f} ms")
    return out


print(f"dim={DIM}  buckets by_user={len(dd.by_user)} by_item={len(dd.by_item)}")
for b in dd.by_user:
    print(f"  u-bucket N={b.n_rows:5d} L={b.width:5d}")
for b in dd.by_item:
    print(f"  i-bucket N={b.n_rows:5d} L={b.width:5d}")

u2 = timeit("step_u", step_u, ue, ie, gram, dual)
v2 = timeit("step_v", step_v, ie, u2, dual)
g2 = timeit("gramian", jax.jit(lambda v: v.T @ v), v2)
timeit("losses", losses, u2, v2, g2)

n = 3
t0 = time.perf_counter()
for _ in range(n):
    model.train_epoch(dd)
jax.block_until_ready(model.state.user_emb)
print(f"full epoch  {(time.perf_counter()-t0)/n*1e3:8.1f} ms")

if TRACE:
    with jax.profiler.trace("/tmp/jaxtrace"):
        model.train_epoch(dd)
        jax.block_until_ready(model.state.user_emb)
    print("trace written to /tmp/jaxtrace")
