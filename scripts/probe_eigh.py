"""Probe: XLA eigh cost at 512 vs matmul-based alternatives on TPU.

The Woodbury path needs Q, Lam with Q Lam Q^T ~= G (shared Gramian).
Accuracy target: reconstruction error, NOT eigenpair accuracy —
clustered directions may mix freely.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = jax.lax.Precision.HIGHEST
D = 512


def fetch(f, *args, reps=3):
    out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


rng = np.random.default_rng(0)
V = rng.normal(size=(40000, D)).astype(np.float32) / np.sqrt(D)
# zipf-ish column scaling for a decaying spectrum like a real Gramian
V *= (1.0 / np.sqrt(np.arange(1, D + 1)))[None, :] * 3
G = jnp.asarray(V.T @ V)

t = fetch(jax.jit(jnp.linalg.eigh), G)
print(f"XLA eigh 512: {t*1e3:.1f} ms")
t = fetch(jax.jit(jnp.linalg.eigh), jnp.stack([G, G * 1.1]))
print(f"XLA eigh [2,512]: {t*1e3:.1f} ms")

w, q = jnp.linalg.eigh(G)
err = jnp.linalg.norm(q @ jnp.diag(w) @ q.T - G) / jnp.linalg.norm(G)
print(f"eigh recon rel err: {float(err):.2e}")


@jax.jit
def matmul_iters(g):
    x = g / jnp.linalg.norm(g)
    def body(x, _):
        return 1.5 * x - 0.5 * jnp.einsum("ab,bc,cd->ad", x, x, x,
                                          precision=P), None
    return jax.lax.scan(body, x, None, length=30)[0]

t = fetch(matmul_iters, G)
print(f"30 Newton-Schulz-style 512-matmul iters: {t*1e3:.2f} ms "
      f"(~{30*2*2*D**3/t/1e12:.1f} TF/s)")


# Warm-started Jacobi refresh: B = Q^T G' Q nearly diagonal; how many
# cyclic block-sweeps to re-diagonalize after an ALS-sized drift?
G2 = G + jnp.asarray(0.01 * (V.T @ (V * rng.normal(
    size=(40000, 1)).astype(np.float32) * 0.05)))
G2 = 0.5 * (G2 + G2.T)
B = q.T @ G2 @ q
off = B - jnp.diag(jnp.diag(B))
print(f"after 1%-drift: offdiag/diag = "
      f"{float(jnp.linalg.norm(off) / jnp.linalg.norm(B)):.2e}")
# reconstruction error if we just KEEP the old basis (diag approx)
recon = q @ jnp.diag(jnp.diag(B)) @ q.T
print(f"stale-basis recon rel err: "
      f"{float(jnp.linalg.norm(recon - G2) / jnp.linalg.norm(G2)):.2e}")
