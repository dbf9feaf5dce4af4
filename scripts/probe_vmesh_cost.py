"""Why is the 8-virtual-device epoch slower on a 1-core host?

Compares XLA's own cost model (flops / bytes accessed) for the compiled
epoch program at 1 device vs N virtual CPU devices. If per-device flops
do not drop ~Nx (total roughly constant), the sharded program inflates
work (padding blowup, re-replication); if they do drop but wall time
does not, the overhead is the CPU backend's per-device runtime
(time-sliced virtual devices, collective memcpys), which real chips do
not pay.

Usage: python scripts/probe_vmesh_cost.py [n_dev] [users] [dim]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

USERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def epoch_cost(mesh):
    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.data.synth import powerlaw_dataset

    users, items = powerlaw_dataset(USERS, 4000, seed=0)
    ds = Dataset(users, items)
    dd = DeviceData.build(ds, dim=DIM, mesh=mesh)
    cfg = Config(dim=DIM, uobs_weight=0.002, l2_reg=0.002, alpha=0.3,
                 bandwidth=0.18, xi_iterations=5, pd_iterations=1)
    model = get_model("safer2", cfg, ds.num_users, ds.num_items, mesh=mesh)
    model.initialize(dd)
    c = (jax.jit(model._epoch).lower(model.state, dd)
         .compile().cost_analysis())
    if isinstance(c, list):
        c = c[0]
    return {k: c.get(k, 0.0) for k in ("flops", "bytes accessed")}


def main():
    from safer2_recommender_tpu.parallel import get_mesh

    c1 = epoch_cost(None)
    cn = epoch_cost(get_mesh())
    print(f"{'':12s} {'1 device':>16s} {N_DEV:>13d}-dev {'ratio':>7s}")
    for k in ("flops", "bytes accessed"):
        r = cn[k] / c1[k] if c1[k] else float("nan")
        print(f"{k:12s} {c1[k]:16.3e} {cn[k]:16.3e} {r:7.2f}")
    print(f"(N-dev numbers are PER-DEVICE: ideal ratio 1/{N_DEV} = "
          f"{1 / N_DEV:.3f}; ~1.0 means the whole program runs on every "
          f"device)")


if __name__ == "__main__":
    main()
