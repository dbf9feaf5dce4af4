"""A/B: explicit-inverse vs factored spd_solve at exact-solver shapes.

Times K scan-chained solves (beats the ~27ms dispatch floor) per shape,
both paths, from one process (the env toggle is read at trace time, so
the factored path is selected via the module switch directly).

Usage: python scripts/ab_factored.py [N d]...
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from safer2_recommender_tpu.ops import block_chol

K = 16
SHAPES = [(2048, 128), (1024, 256), (256, 512), (16, 512)]
spd_raw = getattr(block_chol.spd_solve, "__wrapped__", block_chol.spd_solve)
if len(sys.argv) > 2:
    args = [int(a) for a in sys.argv[1:]]
    SHAPES = list(zip(args[::2], args[1::2]))


def bench(fn, a, rhs):
    @jax.jit
    def chain(a, rhs):
        def body(c, _):
            x = fn(a * (1.0 + 0.0 * c), rhs)
            return jnp.sum(x[:, 0]), None
        return jax.lax.scan(body, 0.0, None, length=K)[0]

    v = float(chain(a, rhs))
    t0 = time.perf_counter()
    float(chain(a, rhs))
    return (time.perf_counter() - t0 - 0.027) / K, v


def main():
    rng = np.random.default_rng(0)
    for n, d in SHAPES:
        b = rng.standard_normal((n, d, 16)).astype(np.float32)
        # assemble [n, d, d] ON DEVICE — a single large host device_put
        # hangs the tunneled runtime (see repro_factored_hang.py)
        a = jax.jit(lambda b: jnp.einsum("nik,njk->nij", b, b)
                    + 0.5 * jnp.eye(d, dtype=jnp.float32))(jnp.asarray(b))
        rhs = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        a_np = np.einsum("nik,njk->nij", b, b) + 0.5 * np.eye(
            d, dtype=np.float32)
        x_np = np.linalg.solve(a_np, np.asarray(rhs)[..., None])[..., 0]
        for label, env in (("explicit", "0"), ("factored", "1")):
            os.environ["FRT_FACTORED_SOLVE"] = env
            # module-level spd_solve is jitted once: its executable would
            # cache the FIRST env value (jit caches by function identity,
            # and _use_factored() is read at trace time). Trace the
            # UNJITTED body under a fresh identity per variant.
            raw = spd_raw

            def solve(a, rhs, _env=env, _raw=raw):
                return _raw(a, rhs)
            t, _ = bench(solve, a, rhs)
            got = np.asarray(jax.jit(solve)(a, rhs))
            err = np.abs(got - x_np).max() / (np.abs(x_np).max() + 1e-30)
            gf = n * d ** 3 / t / 1e9
            print(f"[{n:5d},{d:4d}] {label:9s} {t*1e3:8.2f} ms/call "
                  f"(~{gf:7.1f} GF/s-equiv, rel err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
