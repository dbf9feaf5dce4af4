"""Trace safer2pp (or any model) on the north-star 50k/dim-512 workload.

Runs N scan-chained epochs under jax.profiler.trace; summarize with
``python scripts/trace_ops.py <dir> <N>``.

Usage: python scripts/profile_pp512.py [model] [dim] [trace_dir] [n_epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODEL = sys.argv[1] if len(sys.argv) > 1 else "safer2pp"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 512
TRACE = sys.argv[3] if len(sys.argv) > 3 else "/tmp/trace_pp512"
N = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def main():
    import jax

    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.cli import enable_compilation_cache
    from safer2_recommender_tpu.data.synth import powerlaw_dataset

    enable_compilation_cache()
    users, items = powerlaw_dataset(50_000, 40_000, seed=0)
    ds = Dataset(users, items)
    dd = DeviceData.build(ds, dim=DIM)
    cfg = Config(dim=DIM, uobs_weight=0.0004, l2_reg=0.0012, alpha=0.3,
                 bandwidth=0.1, use_snr=True, sampling_ratio=0.1,
                 xi_iterations=5, pd_iterations=1)
    model = get_model(MODEL, cfg, ds.num_users, ds.num_items)
    model.initialize(dd)
    model.train_epochs(dd, N)            # compile + warm
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE):
        model.train_epochs(dd, N)
        float(model.state.user_emb[0, 0])
    dt = time.perf_counter() - t0
    print(f"{MODEL} dim={DIM}: {N} epochs traced, "
          f"{dt / N * 1e3:.1f} ms/epoch wall -> {TRACE}", flush=True)


if __name__ == "__main__":
    main()
