"""Ablate block_chol._LEAF (lane-leaf size) at the ++ sweeps' shapes.

The leaf kernel's fully-masked column loop costs ~6*r^3*NL VPU ops while
the lane-matmul recursion steps cost 2*h^3*NL; a smaller leaf shifts work
from the former to the latter. Times K scan-chained chol_inverse calls
per (shape, leaf) with a FRESH jit identity per variant (jit caches by
function identity — see memory: jit-cache ablation trap).

Usage: python scripts/ab_leaf.py
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
SHAPES = [(2048, 64), (2048, 32), (2048, 16), (14224, 32), (11478, 64)]
LEAVES = [32, 16, 8]

raw = getattr(block_chol.chol_inverse, "__wrapped__",
              block_chol.chol_inverse)


def main():
    rng = np.random.default_rng(0)
    for n, d in SHAPES:
        b = rng.standard_normal((n, d, 8)).astype(np.float32)
        a = jnp.asarray(np.einsum("nik,njk->nij", b, b)
                        + 0.5 * np.eye(d, dtype=np.float32))
        l_np = np.linalg.cholesky(np.asarray(a))
        base = None
        for leaf in LEAVES:
            block_chol._LEAF = leaf

            def fn(a, _leaf=leaf):
                return raw(a)

            @jax.jit
            def chain(a, _fn=fn):
                def body(c, _):
                    inv = _fn(a * (1.0 + 0.0 * c))
                    return jnp.sum(inv[:, 0, 0]), None
                return jax.lax.scan(body, 0.0, None, length=K)[0]

            float(chain(a))
            t0 = time.perf_counter()
            float(chain(a))
            t = (time.perf_counter() - t0 - 0.027) / K
            got = np.asarray(jax.jit(fn)(a))
            err = (np.abs(np.linalg.inv(l_np) - got).max()
                   / np.abs(np.linalg.inv(l_np)).max())
            base = base or t
            print(f"[{n:6d},{d:3d}] leaf={leaf:2d} {t*1e3:8.3f} ms/call "
                  f"({base/t:4.2f}x, rel err {err:.1e})", flush=True)
        block_chol._LEAF = 32


if __name__ == "__main__":
    main()
