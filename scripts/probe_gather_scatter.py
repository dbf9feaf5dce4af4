"""Probe bf16-table gathers and row-writeback scatter rates (round 4).

Round-3 roofline anomalies (docs/PERFORMANCE.md): slabs appear to be
gathered in f32 and THEN converted (a separate 12.9 ms convert class),
and the row scatter runs at 59 GB/s. This probe measures, on the real
chip, (a) gather variants: cast-then-gather as written, cast forced to
materialize via optimization_barrier, gather-then-cast; (b) scatter
variants: .at[].set with/without unique/sorted hints, and a
dynamic_update_slice baseline (contiguous rows).

Timing per docs/PERFORMANCE.md: chain k reps on device inside lax.scan
with a data dependency, fetch a scalar, difference two k values.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, k1=4, k2=12):
    f1 = jax.jit(lambda *a: fn(*a, k1))
    f2 = jax.jit(lambda *a: fn(*a, k2))
    for f in (f1, f2):
        float(f(*args))  # compile + warm
    ts = {}
    for name, f, k in (("k1", f1, k1), ("k2", f2, k2)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return (ts["k2"] - ts["k1"]) / (k2 - k1)


def main():
    rows, dim = 50_000, 512
    n, width = 2048, 160   # one bucket-ish gather: [n, width, dim]
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, (n, width)).astype(np.int32))
    gb = n * width * dim / 1e9

    def run(body):
        def fn(table, ids, k):
            def step(c, _):
                g = body(table, ids + (c == jnp.inf).astype(jnp.int32))
                return jnp.float32(g.sum()), None
            return jax.lax.scan(step, jnp.float32(0), None, length=k)[0]
        return fn

    g_variants = {
        "cast_then_gather (current)":
            lambda t, i: t.astype(jnp.bfloat16)[i],
        "barrier_cast_then_gather":
            lambda t, i: jax.lax.optimization_barrier(
                t.astype(jnp.bfloat16))[i],
        "gather_then_cast":
            lambda t, i: t[i].astype(jnp.bfloat16),
        "gather_f32":
            lambda t, i: t[i],
    }
    print(f"gather [n={n}, w={width}, d={dim}] "
          f"bf16 bytes={2*gb:.2f} GB f32={4*gb:.2f} GB")
    for name, body in g_variants.items():
        dt = timed(run(body), table, ids)
        bytes_moved = (4 if name == "gather_f32" else 2) * gb
        print(f"  {name:32s} {dt*1e3:7.2f} ms  {bytes_moved/dt:6.0f} GB/s")

    # ---- scatter ----
    sn = 2048
    vals = jnp.asarray(rng.normal(size=(sn, dim)).astype(np.float32))
    rid_rand = jnp.asarray(
        rng.choice(rows, sn, replace=False).astype(np.int32))
    rid_sorted = jnp.sort(rid_rand)
    sgb = sn * dim * 4 / 1e9

    def s_run(body):
        def fn(table, rid, vals, k):
            def step(t, _):
                t = body(t, rid, vals + t[0, 0])
                return t, None
            t = jax.lax.scan(step, table, None, length=k)[0]
            return t[0, 0]
        return fn

    s_variants = {
        "at_set_drop (current)":
            lambda t, r, v: t.at[r].set(v, mode="drop"),
        "at_set_unique":
            lambda t, r, v: t.at[r].set(v, mode="drop",
                                        unique_indices=True),
        "at_set_unique_sorted":
            lambda t, r, v: t.at[r].set(v, mode="drop",
                                        unique_indices=True,
                                        indices_are_sorted=True),
        "dyn_update_slice (contiguous)":
            lambda t, r, v: jax.lax.dynamic_update_slice(
                t, v, (r[0], jnp.int32(0))),
    }
    print(f"scatter [{sn} rows x {dim}] = {sgb*1e3:.0f} MB "
          "(write; read side ~= write for update-in-place)")
    for name, body in s_variants.items():
        rid = rid_sorted if "sorted" in name or "contiguous" in name \
            else rid_rand
        dt = timed(s_run(body), table, rid, vals)
        print(f"  {name:32s} {dt*1e3:7.2f} ms  {sgb/dt:6.0f} GB/s (wr)")


if __name__ == "__main__":
    sys.exit(main())
