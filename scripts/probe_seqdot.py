"""Probe: per-op cost of sequentially DEPENDENT matmuls on TPU.

Chained small matmuls (x <- f(x)) are the backbone of any iterative
method (Newton-Schulz, subspace iteration) and of the block-Cholesky
recursion. Measures us/iteration via scan-length differencing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = jax.lax.Precision

rng = np.random.default_rng(0)


def per_iter(make_body, x0, ks=(16, 128)):
    ts = []
    for k in ks:
        f = jax.jit(lambda x: jax.lax.scan(make_body(), x, None,
                                           length=k)[0])
        float(jnp.sum(f(x0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(f(x0)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (ks[1] - ks[0])


for d in (256, 512):
    x0 = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)) * 0.001

    for name, prec in [("HIGHEST", P.HIGHEST), ("DEFAULT", P.DEFAULT)]:
        def mk(prec=prec):
            def body(x, _):
                y = jnp.dot(x, x, precision=prec)
                return y * (0.999 / jnp.float32(1.0)), None
            return body
        t = per_iter(mk, x0)
        fl = 2 * d ** 3
        print(f"d={d} {name:8s} seq x@x: {t*1e6:8.1f} us/iter "
              f"({fl/t/1e12:6.2f} TF/s)")

    # batched version: 8 independent chains in one scan body
    xb = jnp.stack([x0] * 8)
    def mkb():
        def body(x, _):
            y = jnp.einsum("nab,nbc->nac", x, x, precision=P.HIGHEST)
            return y * 0.999, None
        return body
    t = per_iter(mkb, xb)
    fl = 8 * 2 * d ** 3
    print(f"d={d} HIGHEST  seq batched[8] x@x: {t*1e6:8.1f} us/iter "
          f"({fl/t/1e12:6.2f} TF/s)")

    # independent (non-dependent) dots inside one body, same carry
    def mki():
        def body(x, _):
            ys = [jnp.dot(x * (1.0 + 1e-6 * i), x, precision=P.HIGHEST)
                  for i in range(8)]
            return sum(ys) * (0.999 / 8), None
        return body
    t = per_iter(mki, x0)
    fl = 8 * 2 * d ** 3
    print(f"d={d} HIGHEST  8 indep dots/iter:  {t*1e6:8.1f} us/iter "
          f"({fl/t/1e12:6.2f} TF/s)")
