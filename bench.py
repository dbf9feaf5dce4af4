"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Benchmarks the flagship SAFER2 model on the bundled ML-1M split with the
README's tuned ML-1M hyperparameters (reference README.md "Run Models":
dim=32, uobs=0.004, l2=0.004, alpha=0.3, bandwidth=0.15), measuring
steady-state epoch time on the available accelerator and reporting
users/s/chip (the BASELINE.json north-star metric).

``vs_baseline`` compares against the measured C++ reference epoch time
recorded in BASELINE.md (line `measured_cpp_ml1m_safer2_epoch_ms: N`)
when present, else 0.0 (baseline not yet measured — the reference needs
bazel+network to build).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

ML1M_DIR = os.environ.get("FRECSYS_ML1M_DIR", "/root/reference/tests/ml-1m")
REPO = os.path.dirname(os.path.abspath(__file__))

# README ML-1M safer2 config (dim=32); epochs kept small for benching.
DIM = 32
WARMUP_EPOCHS = 2
BENCH_EPOCHS = 5


def read_baseline_ms() -> float:
    path = os.path.join(REPO, "BASELINE.md")
    if os.path.exists(path):
        m = re.search(r"measured_cpp_ml1m_safer2_epoch_ms:\s*([0-9.]+)",
                      open(path).read())
        if m:
            return float(m.group(1))
    return 0.0


def backend_guard(timeout_s: float = 300.0) -> None:
    """Fail over to CPU if the accelerator backend cannot initialize.

    The axon TPU tunnel, when down, blocks the first backend use for
    ~25 minutes before raising UNAVAILABLE; a benchmark that hangs and
    records nothing is worse than one that reports a (clearly labeled)
    CPU fallback number. Probe the backend in a subprocess with a
    timeout and switch this process to CPU if it does not come up.
    """
    import subprocess

    # NOTE: the env var is NOT a reliable signal here — this host's
    # sitecustomize re-forces the axon platform at interpreter start, so
    # the only honest check is whether a backend actually comes up (and
    # the only effective override is jax.config, not the env).
    try:
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("# accelerator backend unavailable -> CPU fallback",
              file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")


def main() -> int:
    backend_guard()

    import jax

    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    global WARMUP_EPOCHS, BENCH_EPOCHS
    reps = 2
    if jax.default_backend() == "cpu":
        # Emergency fallback only (single host core): keep it bounded.
        WARMUP_EPOCHS, BENCH_EPOCHS, reps = 1, 3, 2

    train = Dataset.from_csv(os.path.join(ML1M_DIR, "train.csv"))
    dd = DeviceData.build(train, dim=DIM)
    cfg = Config(dim=DIM, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
                 bandwidth=0.15, xi_iterations=5, pd_iterations=1,
                 stdev=0.1)
    model = get_model("safer2", cfg, train.num_users, train.num_items)
    model.initialize(dd)

    # NOTE on timing: on tunneled backends ``jax.block_until_ready`` can
    # return before device execution finishes; only a concrete value fetch
    # is a true barrier. We therefore time k1 and k2 epochs each ending in
    # a scalar fetch and difference them, cancelling both the dispatch and
    # the fetch round-trip latency.
    import jax.numpy as jnp

    def sync() -> None:
        float(jnp.sum(model.state.user_loss))

    for _ in range(WARMUP_EPOCHS):
        model.train_epoch(dd)
    sync()

    def run(n_epochs: int) -> float:
        t0 = time.perf_counter()
        model.train_epochs(dd, n_epochs)
        sync()
        return time.perf_counter() - t0

    k1 = 1
    # Warm BOTH chain lengths before timing: each static k compiles (or
    # cache-loads) its own program, and with few reps that cost would
    # otherwise skew the k2-k1 difference.
    run(k1)
    run(BENCH_EPOCHS)
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(BENCH_EPOCHS) for _ in range(reps))
    epoch_s = (t2 - t1) / (BENCH_EPOCHS - k1)

    num_train_users = int((dd.user_hist_size > 0).sum())
    # The model/data are built without a mesh, so training runs on ONE
    # chip regardless of jax.device_count() — normalize by what ran.
    n_chips = 1
    users_per_s_chip = num_train_users / epoch_s / n_chips

    base_ms = read_baseline_ms()
    vs_baseline = (base_ms / 1000.0) / epoch_s if base_ms else 0.0

    print(json.dumps({
        "metric": "safer2_ml1m_dim32_users_per_s_per_chip",
        "value": round(users_per_s_chip, 1),
        "unit": "users/s/chip",
        "vs_baseline": round(vs_baseline, 2),
        # honest labeling: a "cpu" backend here means the TPU tunnel was
        # down and this is the emergency fallback, not a TPU regression
        # (see BASELINE.md for the measured TPU numbers)
        "backend": jax.default_backend(),
    }))
    print(f"# epoch_time_ms={epoch_s * 1000:.1f} device={jax.devices()[0]}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
