"""Audit the per-epoch cross-device collective traffic from compiled HLO.

Compiles each model's full sharded training epoch over a virtual
8-device CPU mesh and prints every collective op kind with its summed
per-device result bytes, next to the embedding-table sizes — the
measured basis for docs/SCALING.md's traffic model (a regression gate
on the same numbers lives in tests/test_multidevice.py).

Usage: python scripts/audit_collectives.py [num_users] [num_items] [dim]
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from safer2_recommender_tpu import (Config, Dataset, DeviceData,  # noqa: E402
                                    get_model)
from safer2_recommender_tpu.data.synth import powerlaw_dataset  # noqa: E402
from safer2_recommender_tpu.parallel import get_mesh  # noqa: E402
from safer2_recommender_tpu.parallel.audit import (collective_traffic,  # noqa: E402
                                                   total_bytes)

NUM_USERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000
NUM_ITEMS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main():
    users, items = powerlaw_dataset(NUM_USERS, NUM_ITEMS, mean_hist=20,
                                    seed=1)
    ds = Dataset(users, items)
    mesh = get_mesh(jax.devices()[:8])
    dd = DeviceData.build(ds, mesh=mesh, dim=DIM)
    table_bytes = (ds.num_users + ds.num_items) * DIM * 4

    from safer2_recommender_tpu import FoldInData

    tr = Dataset(ds.user_ids[::2], ds.item_ids[::2])
    te = Dataset(ds.user_ids[1::2], ds.item_ids[1::2])
    fold = FoldInData.build(tr, te, num_items=ds.num_items, dim=DIM,
                            mesh=mesh)

    def show(tag, traffic, basis_bytes, basis_tag):
        tot = total_bytes(traffic)
        print(f"-- {tag} --")
        for kind, (cnt, byt) in sorted(traffic.items()):
            print(f"  {kind:<22} x{cnt:<4} {byt / 1e6:10.3f} MB")
        print(f"  {'TOTAL':<22}       {tot / 1e6:10.3f} MB"
              f"   ({basis_tag}: {basis_bytes / 1e6:.3f} MB, "
              f"ratio {tot / basis_bytes:.2f}x)")

    for name in ("safer2", "safer2pp", "ials"):
        cfg = Config(dim=DIM, block_size=max(DIM // 8, 8), alpha=0.3,
                     bandwidth=0.15, compute_dtype="f32")
        model = get_model(name, cfg, ds.num_users, ds.num_items, mesh=mesh)
        hlo = (jax.jit(model._epoch)
               .lower(model.state, dd).compile().as_text())
        print(f"\n== {name} (dim={DIM}, {ds.nnz} tuples, 8-device mesh) ==")
        show("training epoch", collective_traffic(hlo), table_bytes,
             "U+V tables")

        # Eval path (VERDICT r2 item 7): fold-in + chunked scoring/top-k.
        hlo_f = (jax.jit(model._fold_in)
                 .lower(model.state, fold).compile().as_text())
        ue = model._fold_in_jit(model.state, fold)
        hlo_e = (jax.jit(model._eval_metrics, static_argnames=("k_list",))
                 .lower(ue, model.state.item_emb, fold,
                        k_list=(5, 10, 20, 50, 100)).compile().as_text())
        ue_bytes = fold.n_pad * DIM * 4
        input_bytes = ue_bytes + sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in (fold.excl, fold.gt, fold.gt_len))
        show("eval fold-in", collective_traffic(hlo_f), ue_bytes,
             "eval-user table")
        show("eval scoring+metrics", collective_traffic(hlo_e),
             input_bytes, "eval inputs")


if __name__ == "__main__":
    main()
