"""Measure exact_quantile strategies at MSD scale (VERDICT r2 weak 7).

cvar_mf's exact xi is the floor(n*alpha)-th largest loss (reference
cvar_mf.h:582-595). At n=571k, alpha=0.3 the selection is 171k wide;
this times lax.top_k(k) vs a full jnp.sort at that shape, steady-state
(16-call scan chains, dispatch floor subtracted).

Usage: python scripts/probe_quantile.py [n] [alpha]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 571_000
ALPHA = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
K = 16


def bench(fn, x):
    @jax.jit
    def chain(x):
        def body(c, _):
            return c + fn(x + 0.0 * c), None
        return jax.lax.scan(body, 0.0, None, length=K)[0]

    v = float(chain(x))
    t0 = time.perf_counter()
    float(chain(x))
    return (time.perf_counter() - t0 - 0.027) / K, v / K


def main():
    q = min(int(N * ALPHA), N - 1)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(N).astype(np.float32))
    for label, fn in [
        ("top_k", lambda x: jax.lax.top_k(x, q + 1)[0][q]),
        ("sort", lambda x: jnp.sort(x)[N - 1 - q]),
    ]:
        t, v = bench(fn, x)
        print(f"n={N} q={q} {label:6s} {t * 1e3:8.2f} ms/call "
              f"(xi={v:.4f})", flush=True)


if __name__ == "__main__":
    main()
