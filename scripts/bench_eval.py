"""Time held-out evaluation (fold-in + full-catalog scoring + metrics).

The ++ models' evaluation runs 8 blockwise fold-in epochs (reference
ialspp.h:149-206, safer2pp.h:220-286) — a mini-training loop that could
silently dominate --print_evaluation_stats runs. This measures
``evaluate_dataset`` wall time for safer2 and safer2pp on the bundled
ML-1M fold across dims; results go in BASELINE.md's eval-time table.

Usage: python scripts/bench_eval.py [dims...]   (default: 32 256 512)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from safer2_recommender_tpu import (Config, Dataset, DeviceData,  # noqa: E402
                                    FoldInData, get_model)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ML1M = os.environ.get("FRECSYS_ML1M_DIR", os.path.join(REPO, "tests/ml-1m"))
DIMS = [int(a) for a in sys.argv[1:]] or [32, 256, 512]


def main():
    from safer2_recommender_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    train = Dataset.from_csv(os.path.join(ML1M, "train.csv"))
    val_tr = Dataset.from_csv(os.path.join(ML1M, "validation_tr.csv"))
    val_te = Dataset.from_csv(os.path.join(ML1M, "validation_te.csv"))

    for dim in DIMS:
        dd = DeviceData.build(train, dim=dim)
        fold = FoldInData.build(val_tr, val_te, num_items=train.num_items,
                                dim=dim)
        for name in ("safer2", "safer2pp"):
            cfg = Config(dim=dim, block_size=64, uobs_weight=0.004,
                         l2_reg=0.004, alpha=0.3, bandwidth=0.15)
            m = get_model(name, cfg, train.num_users, train.num_items)
            m.initialize(dd)
            m.train_epoch(dd)
            res = m.evaluate_dataset(fold)          # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = m.evaluate_dataset(fold)      # returns numpy: synced
                times.append(time.perf_counter() - t0)
            print(f"{name:10s} dim={dim:4d} eval={min(times)*1e3:8.1f} ms "
                  f"(ndcg@20={res.mean_ndcg()[2]:.4f}, "
                  f"{fold.n_eval} users)", flush=True)


if __name__ == "__main__":
    main()
