"""Probe: XLA eigh cost vs size/batch on TPU (chained timing)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def per_iter(f, x0, ks=(2, 8)):
    ts = []
    for k in ks:
        def body(c, _):
            tok = (c == jnp.inf).astype(x0.dtype)
            w, q = f(x0 + tok)
            return c + 1e-20 * jnp.sum(w), None
        g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        float(g(jnp.float32(0.0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (ks[1] - ks[0])


for batch, d in [(1, 512), (2, 512), (1, 256), (2, 256), (4, 256),
                 (1, 128), (4, 128), (8, 128), (8, 64), (16, 64),
                 (16, 32)]:
    a = rng.normal(size=(batch, d, d)).astype(np.float32)
    g = np.einsum("nab,ncb->nac", a, a) / d
    x = jnp.asarray(g if batch > 1 else g[0])
    t = per_iter(jnp.linalg.eigh, x)
    print(f"eigh[{batch:2d},{d:3d}]: {t*1e3:8.2f} ms")
