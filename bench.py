"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric (the BASELINE.json north star): SAFER2 at dim=512 on an
MSD-shaped synthetic workload (50k users / 40k items / ~1.65M tuples,
power-law popularity — MSD itself is not downloadable here; the README's
MSD config is dim=512, uobs=0.0004, l2=0.0012, bandwidth=0.1, use_snr),
measuring steady-state epoch time and users/s/chip. ``vs_baseline``
compares against an IDEAL 64-core run of the C++ reference on the SAME
workload: the measured single-core epoch time recorded in BASELINE.md
(line ``measured_cpp_synth50k_dim512_epoch_s: N``) divided by 64 — i.e.
assuming perfect reference scaling, so the number is conservative. The
north-star target is vs_baseline >= 5.

The same JSON object also carries the round-1 metric (SAFER2, bundled
ML-1M split, README dim=32 config) as ``ml1m_dim32_users_per_s_chip`` /
``ml1m_dim32_vs_cpp_1core`` so the small-dim dispatch-bound regime stays
tracked round over round.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
ML1M_DIR = os.environ.get("FRECSYS_ML1M_DIR",
                          os.path.join(REPO, "tests", "ml-1m"))

# North-star workload (matches BASELINE.md's measured table row and the
# head-to-head CSV fed to the C++ reference).
NS_USERS, NS_ITEMS, NS_DIM, NS_SEED = 50_000, 40_000, 512, 0


def read_baseline(key: str) -> float:
    path = os.path.join(REPO, "BASELINE.md")
    if os.path.exists(path):
        m = re.search(key + r":\s*([0-9.]+)", open(path).read())
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


def time_epochs(model, dd, bench_epochs: int, reps: int) -> float:
    """Steady-state epoch seconds via chained-epoch differencing.

    On tunneled backends ``jax.block_until_ready`` can return before
    device execution finishes; only a concrete value fetch is a true
    barrier. Time k1 and k2 epochs each ending in a scalar fetch and
    difference them, cancelling dispatch + fetch round-trip latency.
    Both chain lengths are warmed first (each static k compiles or
    cache-loads its own program).
    """
    import jax.numpy as jnp

    def run(n: int) -> float:
        t0 = time.perf_counter()
        model.train_epochs(dd, n)
        float(jnp.sum(model.state.user_loss))
        return time.perf_counter() - t0

    run(1)
    run(bench_epochs)
    t1 = min(run(1) for _ in range(reps))
    t2 = min(run(bench_epochs) for _ in range(reps))
    return (t2 - t1) / (bench_epochs - 1)


def bench_northstar(on_cpu: bool):
    """dim=512 on the MSD-shaped 50k-user synthetic workload: ALL SIX
    models (VERDICT r3 item 6) — the exact SAFER2 north-star, the
    blockwise engines (safer2pp/ialspp, block 64), and the baselines
    (ials, erm_mf, cvar_mf) so any solver-path regression shows in the
    round artifact."""
    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.data.synth import powerlaw_dataset

    users, items = powerlaw_dataset(NS_USERS, NS_ITEMS, seed=NS_SEED)
    ds = Dataset(users, items)
    dim = 64 if on_cpu else NS_DIM  # CPU fallback: keep it bounded
    dd = DeviceData.build(ds, dim=dim)
    cfg = Config(dim=dim, uobs_weight=0.0004, l2_reg=0.0012, alpha=0.3,
                 bandwidth=0.1, use_snr=True, sampling_ratio=0.1,
                 xi_iterations=5, pd_iterations=1, block_size=64,
                 stepsize=0.1)
    n_users = None
    out = {}
    serve_rate, serve_fixed = None, {}
    for name in (("safer2",) if on_cpu else
                 ("safer2", "safer2pp", "ialspp", "ials", "erm_mf",
                  "cvar_mf")):
        model = get_model(name, cfg, ds.num_users, ds.num_items)
        model.initialize(dd)
        model.train_epochs(dd, 1)
        out[name] = time_epochs(model, dd,
                                bench_epochs=3 if on_cpu else 4,
                                reps=1 if on_cpu else 2)
        if n_users is None:
            n_users = int((dd.user_hist_size > 0).sum())
        if name == "safer2" and not on_cpu:
            serve_rate = bench_serving(model, ds)
            serve_fixed = bench_serving_fixed(model, ds)
        del model
    return out, n_users, dim, serve_rate, serve_fixed


def _serve_batch(ds, batch: int, seed: int):
    """One request batch of brand-new users with power-law histories."""
    import numpy as np

    from safer2_recommender_tpu import Dataset

    rng = np.random.default_rng(seed)
    hl = np.clip(rng.lognormal(np.log(20), 0.8, batch), 3,
                 500).astype(np.int64)
    pop = 1.0 / (np.arange(1, ds.num_items + 1) ** 0.8)
    pop /= pop.sum()
    su = np.repeat(np.arange(batch, dtype=np.int32), hl)
    si = rng.choice(ds.num_items, size=int(hl.sum()),
                    p=pop).astype(np.int32)
    return Dataset(su, si)


def bench_serving(model, ds, batch: int = 4096) -> float:
    """End-to-end recommend() users/s for a batch of new users against
    the north-star catalog (fold-in + scoring + exact top-k + id
    decode + host transfer) — the serving surface BASELINE.md records."""
    serve = _serve_batch(ds, batch, seed=7)

    def once():
        t0 = time.perf_counter()
        model.recommend(serve, k=100)
        return time.perf_counter() - t0

    once()
    return batch / min(once() for _ in range(3))


def bench_serving_fixed(model, ds) -> dict:
    """The compile-once Server (serving.py) under PRODUCTION conditions:
    steady-state throughput over VARYING request batches (different
    sizes and history draws every call — the case the dynamic path
    recompiles on), asserting zero recompiles after warmup, plus
    small-batch p50 latency (VERDICT r4 next-round #2)."""
    import numpy as np

    from safer2_recommender_tpu.serving import Server

    srv = Server(model, k=100, batch_sizes=(64, 1024, 4096),
                 widths=(128, 512))
    # warmup: touch every rung the measured traffic will use
    for b in (48, 900, 4096, 2500):
        srv.recommend(_serve_batch(ds, b, seed=100 + b))
    warm_compiles = srv.num_compiles

    sizes = [int(s) for s in
             np.random.default_rng(11).integers(256, 4096, 16)]
    batches = [_serve_batch(ds, b, seed=200 + i)
               for i, b in enumerate(sizes)]
    t0 = time.perf_counter()
    served = sum(u.size for u, _ in srv.recommend_stream(batches))
    varying_rate = served / (time.perf_counter() - t0)
    assert srv.num_compiles == warm_compiles, (
        f"serving recompiled: {warm_compiles} -> {srv.num_compiles}")

    small = [_serve_batch(ds, 64, seed=400 + i) for i in range(8)]
    lat = []
    for _ in range(6):
        for b in small:
            t0 = time.perf_counter()
            srv.recommend(b)
            lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1000)
    return {"serving_varying_users_per_s_chip": round(varying_rate, 1),
            "serving_p50_ms_batch64": round(p50_ms, 2),
            "serving_compiled_programs": srv.num_compiles}


def bench_ml1m(on_cpu: bool):
    """SAFER2, bundled ML-1M split, README dim=32 config (round-1 metric)
    plus a mechanically-checked QUALITY number: fixed-seed 10-epoch
    NDCG@20 on the bundled validation fold (VERDICT r4 next-round #5 —
    quality drift shows up in the regressions field, not just in manual
    head-to-heads)."""
    from safer2_recommender_tpu import (Config, Dataset, DeviceData,
                                        FoldInData, get_model)

    train = Dataset.from_csv(os.path.join(ML1M_DIR, "train.csv"))
    dd = DeviceData.build(train, dim=32)
    cfg = Config(dim=32, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
                 bandwidth=0.15, xi_iterations=5, pd_iterations=1,
                 stdev=0.1, seed=0)
    model = get_model("safer2", cfg, train.num_users, train.num_items)
    model.initialize(dd)
    model.train_epochs(dd, 1)
    # 20-epoch chains: at dim 32 the epoch is ~3.6 ms against a ~27 ms
    # dispatch floor, and 5-epoch differencing wandered 3.56-4.12 ms rep
    # to rep (the r3->r4 "3.6 -> 3.9 ms drift" was THIS measurement
    # noise, not a regression — probed 2026-08-21, BASELINE.md); the
    # longer chain pins it at 3.60 +- 0.05.
    epoch_s = time_epochs(model, dd, bench_epochs=3 if on_cpu else 20,
                          reps=2)
    n_users = int((dd.user_hist_size > 0).sum())

    ndcg20 = None
    vtr = os.path.join(ML1M_DIR, "validation_tr.csv")
    if os.path.exists(vtr) or os.path.exists(vtr + ".gz"):
        fold = FoldInData.build(Dataset.from_csv(vtr),
                                Dataset.from_csv(os.path.join(
                                    ML1M_DIR, "validation_te.csv")),
                                num_items=train.num_items)
        m2 = get_model("safer2", cfg, train.num_users, train.num_items)
        m2.initialize(dd)
        m2.train_epochs(dd, 10)
        res = m2.evaluate_dataset(fold, k_list=(20,))
        ndcg20 = float(res.ndcg.mean(0)[0])
    return epoch_s, n_users / epoch_s, ndcg20


def main() -> int:
    backend_guard()

    import jax

    from safer2_recommender_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    on_cpu = jax.default_backend() == "cpu"

    ns_times, ns_users, ns_dim, serve_rate, serve_fixed = (
        bench_northstar(on_cpu))
    ns_epoch_s = ns_times["safer2"]
    ns_rate = ns_users / ns_epoch_s
    ml_epoch_s, ml_rate, ml_ndcg20 = bench_ml1m(on_cpu)

    cpp_1core_s = read_baseline("measured_cpp_synth50k_dim512_epoch_s")
    vs_ideal_64core = (cpp_1core_s / 64.0) / ns_epoch_s if (
        cpp_1core_s and ns_dim == NS_DIM) else 0.0
    ml_base_ms = read_baseline("measured_cpp_ml1m_safer2_epoch_ms")
    ml_vs = (ml_base_ms / 1000.0) / ml_epoch_s if ml_base_ms else 0.0

    # Regression gate (VERDICT r4 next-round #5): every tracked metric
    # vs its recorded_* value in BASELINE.md. >15% slower (or >0.008
    # NDCG drop) is NAMED in the artifact instead of drifting silently.
    regressions = []
    if not on_cpu:
        for name, took in ns_times.items():
            rec = read_baseline(f"recorded_{name}_dim512_epoch_ms")
            if rec and took * 1000 > 1.15 * rec:
                regressions.append(
                    f"{name}_dim512_epoch_ms {took * 1000:.1f} vs "
                    f"recorded {rec}")
        rec = read_baseline("recorded_ml1m_dim32_epoch_ms")
        if rec and ml_epoch_s * 1000 > 1.15 * rec:
            regressions.append(
                f"ml1m_dim32_epoch_ms {ml_epoch_s * 1000:.1f} vs "
                f"recorded {rec}")
        rec = read_baseline("recorded_serving_users_per_s_chip")
        if rec and serve_rate and serve_rate < rec / 1.15:
            regressions.append(
                f"serving_users_per_s_chip {serve_rate:.0f} vs "
                f"recorded {rec}")
        rec = read_baseline("recorded_ml1m_safer2_dim32_ndcg20_10ep")
        if rec and ml_ndcg20 is not None and ml_ndcg20 < rec - 0.008:
            regressions.append(
                f"ml1m_safer2_dim32_ndcg20_10ep {ml_ndcg20:.4f} vs "
                f"recorded {rec}")

    print(json.dumps({
        "metric": "safer2_dim512_msd50k_users_per_s_per_chip",
        "value": round(ns_rate, 1),
        "unit": "users/s/chip",
        # vs an IDEAL (perfectly scaling) 64-core reference on the same
        # workload; the >=5x north-star target counts against this
        "vs_baseline": round(vs_ideal_64core, 2),
        "epoch_ms": round(ns_epoch_s * 1000, 1),
        # blockwise (++) models on the SAME workload/dim — regression
        # guard for the block-sweep engine (absent on the CPU fallback)
        **{f"{name}_dim512_epoch_ms": (
            round(ns_times[name] * 1000, 1) if name in ns_times else None)
           for name in ("safer2pp", "ialspp", "ials", "erm_mf",
                        "cvar_mf")},
        "serving_users_per_s_chip": (round(serve_rate, 1)
                                     if serve_rate else None),
        # compile-once Server: varying-batch steady state + p50 latency
        **serve_fixed,
        "ml1m_dim32_users_per_s_chip": round(ml_rate, 1),
        "ml1m_safer2_dim32_ndcg20_10ep": (round(ml_ndcg20, 4)
                                          if ml_ndcg20 is not None
                                          else None),
        # named regressions vs BASELINE.md recorded_* values (empty =
        # every tracked metric within 15% / quality within 0.008)
        "regressions": regressions,
        "ml1m_dim32_vs_cpp_1core": round(ml_vs, 2),
        "ml1m_dim32_epoch_ms": round(ml_epoch_s * 1000, 1),
        # honest labeling: a "cpu" backend means the TPU tunnel was down
        # and this is the emergency fallback (dim shrunk to stay
        # bounded), not a TPU regression — see BASELINE.md
        "backend": jax.default_backend(),
        "dim": ns_dim,
    }))
    print(f"# device={jax.devices()[0]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
