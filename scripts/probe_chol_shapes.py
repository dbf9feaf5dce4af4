"""Microbench chol_inverse / cholesky_solve at the north-star workload's
actual per-bucket shapes (scan-chained to beat the ~27ms dispatch floor).

Usage: python scripts/probe_chol_shapes.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from safer2_recommender_tpu.ops import block_chol

K = 20

# (batch, size, count_per_epoch) — from the 50k/40k dim-512 bucket dump:
# woodbury capacitance solves (w <= 32) and direct 64x64 block solves.
SHAPES = [
    (2048, 8, 6 * 8), (2048, 16, 14 * 8), (2048, 32, 14 * 8),
    (2048, 64, 9 * 8), (1304, 64, 8), (968, 64, 8),
    (400, 64, 8), (200, 64, 8), (176, 64, 8), (72, 64, 8),
    (32, 64, 8), (24, 64, 8), (16, 64, 8), (8, 64, 5 * 8),
]


def main():
    rng = np.random.default_rng(0)
    total = 0.0
    for n, w, cnt in SHAPES:
        b = rng.standard_normal((n, w, 8)).astype(np.float32)
        a = jnp.asarray(np.einsum("nik,njk->nij", b, b)
                        + 0.5 * np.eye(w, dtype=np.float32))

        @jax.jit
        def run(a):
            def body(c, _):
                inv = block_chol.chol_inverse(a + c * 1e-9)
                return jnp.sum(inv[:, 0, 0]), None
            return jax.lax.scan(body, 0.0, None, length=K)[0]

        float(run(a))
        t0 = time.perf_counter()
        float(run(a))
        per = (time.perf_counter() - t0) / K
        total += per * cnt
        gf = n * w ** 3 / per / 1e9
        print(f"[{n:5d},{w:3d}] {per*1e3:7.3f} ms/call x{cnt:4d}/ep "
              f"-> {per*cnt*1e3:7.2f} ms/ep  (~{gf:6.1f} GF/s)", flush=True)
    print(f"modeled chol total: {total*1e3:.1f} ms/ep", flush=True)


if __name__ == "__main__":
    main()
