"""Wall-clock epoch time: 1 vs N virtual CPU devices (VERDICT r2 item 8).

The HLO collective audit (parallel/audit.py) bounds communication
*bytes*; this measures actual wall-clock of the sharded program so a
sharding regression that costs time without extra collective traffic
(bad layouts, per-shard padding blowup, host sync points) is visible.

CAVEAT recorded with the result: this host exposes ONE physical core,
so N virtual devices time-slice it and the IDEAL speedup is 1.0x, not
Nx — the measurement checks that SPMD partitioning costs ~nothing in
wall terms (and the per-device FLOP share drops Nx, which real chips
turn into speedup). Run on a quiet core.

Usage: python scripts/bench_virtual_scaling.py [n_dev] [users] [dim] [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

USERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 256
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def run(mesh):
    import jax.numpy as jnp

    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.data.synth import powerlaw_dataset

    users, items = powerlaw_dataset(USERS, 4000, seed=0)
    ds = Dataset(users, items)
    dd = DeviceData.build(ds, dim=DIM, mesh=mesh)
    cfg = Config(dim=DIM, uobs_weight=0.002, l2_reg=0.002, alpha=0.3,
                 bandwidth=0.18, xi_iterations=5, pd_iterations=1)
    model = get_model("safer2", cfg, ds.num_users, ds.num_items,
                      mesh=mesh)
    model.initialize(dd)
    model.train_epochs(dd, 1)          # compile
    t0 = time.perf_counter()
    model.train_epochs(dd, EPOCHS)
    float(jnp.sum(model.state.user_loss))
    dt = (time.perf_counter() - t0) / EPOCHS
    return dt


def main():
    from safer2_recommender_tpu.parallel import get_mesh

    t1 = run(None)
    print(f"1 device : {t1 * 1e3:8.1f} ms/epoch", flush=True)
    tn = run(get_mesh())
    print(f"{N_DEV} devices: {tn * 1e3:8.1f} ms/epoch "
          f"(x{t1 / tn:.2f} wall; ideal 1.0x on this 1-core host — "
          f"per-device FLOPs are 1/{N_DEV})", flush=True)


if __name__ == "__main__":
    main()
