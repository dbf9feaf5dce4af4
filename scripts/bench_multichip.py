"""Multi-chip scaling harness: epoch time vs mesh size.

Runs the flagship SAFER2 epoch on 1, 2, 4, ... N-device meshes (bucket
rows sharded over the "data" axis, tables replicated, Gramians
all-reduced over ICI by XLA) and reports users/s and scaling efficiency
relative to the 1-device run.

On a TPU pod slice this measures the BASELINE.json north-star (>=80%
efficiency at >=2 hosts). On this dev host (1 chip) it can only exercise
the virtual CPU mesh for functional validation:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_multichip.py

Usage: python scripts/bench_multichip.py [dim] [epochs_per_measure]
"""
import sys
import time

import numpy as np

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ML1M = "/root/reference/tests/ml-1m"


def main():
    import jax
    import jax.numpy as jnp

    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.parallel import get_mesh

    train = Dataset.from_csv(f"{ML1M}/train.csv")
    cfg = Config(dim=DIM, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
                 bandwidth=0.15, xi_iterations=5, pd_iterations=1)

    if jax.default_backend() == "cpu":
        print("WARNING: CPU backend — virtual devices share one core; "
              "numbers below validate function, not scaling.")

    n_dev = jax.device_count()
    sizes = []
    s = 1
    while s <= n_dev:
        sizes.append(s)
        s *= 2

    base = None
    for n in sizes:
        mesh = get_mesh(jax.devices()[:n]) if n > 1 else None
        dd = DeviceData.build(train, mesh=mesh, dim=DIM)
        model = get_model("safer2", cfg, train.num_users, train.num_items,
                          mesh=mesh)
        model.initialize(dd)

        def run(k):
            t0 = time.perf_counter()
            model.train_epochs(dd, k)
            float(jnp.sum(model.state.user_loss))
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(2))
        tk = min(run(K) for _ in range(2))
        epoch_s = (tk - t1) / (K - 1)
        if base is None:
            base = epoch_s
        eff = base / (epoch_s * n)
        print(f"devices={n:3d}  epoch={epoch_s*1e3:8.1f} ms  "
              f"speedup={base/epoch_s:5.2f}x  efficiency={eff*100:5.1f}%")


if __name__ == "__main__":
    main()
