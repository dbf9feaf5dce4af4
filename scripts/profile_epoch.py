"""Per-phase epoch profiler (correct timing for the axon tunnel).

``jax.block_until_ready`` does not block on tunneled backends; only a
concrete value fetch is a barrier, and each jitted call pays a ~27ms host
round trip. Phases are therefore timed as (fetch-ended run) minus a
baseline fetch, and the steady-state epoch from scan-chained epochs.

Usage: python scripts/profile_epoch.py [model] [dim]
"""
import sys
import time

import jax
import jax.numpy as jnp

from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.ops import quantile

MODEL = sys.argv[1] if len(sys.argv) > 1 else "safer2"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 32

ML1M = "/root/reference/tests/ml-1m"
train = Dataset.from_csv(f"{ML1M}/train.csv")
dd = DeviceData.build(train, dim=DIM)
cfg = Config(dim=DIM, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
             bandwidth=0.15, xi_iterations=5, pd_iterations=1)
model = get_model(MODEL, cfg, train.num_users, train.num_items)
model.initialize(dd)
st = model.state


def fetch_time(f, *args, reps=3):
    float(jnp.sum(f(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


base = fetch_time(jax.jit(lambda s: s.xi + 0.0), st)
print(f"model={MODEL} dim={DIM}  buckets u={len(dd.by_user)} "
      f"i={len(dd.by_item)}  (base fetch {base*1e3:.0f} ms)")

phases = []
if hasattr(model, "_step_u"):
    phases += [
        ("step_u", jax.jit(lambda s: model._step_u(
            s.user_emb, s.item_emb, s.item_gramian, dd.by_user,
            s.dual_weight)[0].sum())),
        ("step_v", jax.jit(lambda s: model._step_v(
            s.item_emb, s.user_emb, dd, s.dual_weight)[0].sum())),
    ]
phases += [
    ("losses", jax.jit(lambda s: common.user_losses(
        s.user_emb, s.item_emb, s.item_gramian, dd.by_user, dd.num_users,
        cfg.uobs_weight, halve=True).sum())),
    ("xi", jax.jit(lambda s: quantile.compute_xi(
        s.user_loss, s.xi, jax.random.PRNGKey(0), nr_iterations=5,
        bandwidth=cfg.bandwidth, alpha=cfg.alpha, use_epanechnikov=False,
        use_snr=False, sampling_ratio=0.1))),
]
for name, f in phases:
    print(f"  {name:8s} {(fetch_time(f, st)-base)*1e3:8.1f} ms")


def run(k):
    t0 = time.perf_counter()
    model.train_epochs(dd, k)
    float(jnp.sum(model.state.user_loss))
    return time.perf_counter() - t0


t1 = min(run(1) for _ in range(2))
t5 = min(run(5) for _ in range(2))
print(f"steady-state epoch: {(t5-t1)/4*1e3:.1f} ms")
