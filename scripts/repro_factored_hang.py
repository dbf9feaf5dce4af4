"""Repro for the round-1 "factored-solve device hang" — RESOLVED round 3.

Root cause (recorded runs, 2026-08-20): not the solver. This script used
to ``device_put`` its host-built [N, d, d] operand, and a SINGLE
>= 512 MB host->device transfer over the tunneled v5e runtime never
completes (a bare ``jax.device_put(np.ones((512,512,512)))`` hangs with
no solver code; 256 MB completes; BOTH solver paths "hung" identically
at (d=512, n>=512) and worked at n=256). Killing the client
mid-transfer wedges the chip for ~30 min. Fixes: operands here are now
built ON DEVICE, and ``parallel/mesh.py::put`` chunks large host
transfers. The factored path is the TPU default since round 3
(``ops/block_chol.py::_factored_for``; docs/PERFORMANCE.md).

This script remains as the staged probe: each stage prints a line
BEFORE dispatching so a log shows where a run stopped.

Usage: FRT_FACTORED_SOLVE=1 timeout 300 python scripts/repro_factored_hang.py [d] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

D = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from safer2_recommender_tpu.ops import block_chol

    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"FRT_FACTORED_SOLVE={os.environ.get('FRT_FACTORED_SOLVE')}",
          flush=True)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((N, D, 8)).astype(np.float32)
    rhs = rng.standard_normal((N, D)).astype(np.float32)
    # assemble the [N, D, D] operand ON DEVICE: transferring it from host
    # is exactly the >=512MB single-device_put hang this repro chased
    a = jax.jit(lambda b: jnp.einsum("nik,njk->nij", b, b)
                + 0.5 * jnp.eye(D, dtype=jnp.float32))(jnp.asarray(b))
    a.block_until_ready()
    rhs = jnp.asarray(rhs)

    for stage, fn in [
        ("spd_solve", lambda: block_chol.spd_solve(a, rhs)),
        ("chol_inverse", lambda: block_chol.chol_inverse(a)),
    ]:
        print(f"stage {stage} d={D} n={N}: dispatching...", flush=True)
        t0 = time.perf_counter()
        out = fn()
        val = float(jnp.sum(jnp.abs(out)))  # true barrier on axon
        print(f"stage {stage}: completed in "
              f"{time.perf_counter() - t0:.2f}s (|out|={val:.3e})",
              flush=True)

    # numeric check vs numpy
    x = np.linalg.solve(np.asarray(a), np.asarray(rhs)[..., None])[..., 0]
    got = np.asarray(block_chol.spd_solve(a, rhs))
    err = np.abs(got - x).max() / (np.abs(x).max() + 1e-30)
    print(f"rel err vs numpy: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
