"""Minimal repro for the factored-solve device hang (VERDICT r1 item 7).

Round 1 observed: with FRT_FACTORED_SOLVE=1 the solve program at d >= 128
dispatched and never completed on the tunneled v5e runtime (chip wedged
~30 min after killing the client). This drives the suspect path at the
smallest shape that showed it, in stages, so the exact failing stage is
recorded. Run under ``timeout`` from a wrapper; each stage prints a line
BEFORE dispatching so the log shows where it stopped.

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
    a = np.einsum("nik,njk->nij", b, b) + 0.5 * np.eye(D, dtype=np.float32)
    rhs = rng.standard_normal((N, D)).astype(np.float32)
    a, rhs = jnp.asarray(a), jnp.asarray(rhs)

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
