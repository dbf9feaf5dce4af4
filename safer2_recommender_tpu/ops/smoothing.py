"""Smoothing kernels for the convolution-type smoothed CVaR objective.

Pure-jnp ports of the reference's scalar helpers (they cite Remark 3.1 of
He et al. 2021 for the integrated-CDF losses):

  gaussian_kernel / _cdf / gaussian_loss        reference safer2.h:599-615
  epanechnikov_kernel / _cdf / epanechnikov_loss reference safer2.h:617-647

All functions are elementwise over arrays (the reference applies them via
``unaryExpr`` over loss vectors, safer2.h:660-686).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_M_SQRT1_2 = math.sqrt(0.5)


def gaussian_kernel(u: jax.Array, h: float) -> jax.Array:
    z = (u / h) * _M_SQRT1_2
    return _INV_SQRT_2PI * jnp.exp(-(z * z)) / h


def gaussian_cdf(u: jax.Array, h: float) -> jax.Array:
    return 0.5 * erfc(-(u / h) * _M_SQRT1_2)


def gaussian_loss(u: jax.Array, h: float, alpha: float) -> jax.Array:
    ell = h * gaussian_kernel(u, h) + (u / h) * (1.0 - 2.0 * gaussian_cdf(-u, h))
    return (h / 2.0) * ell + ((1.0 - alpha) - 0.5) * u


def epanechnikov_kernel(u: jax.Array, h: float) -> jax.Array:
    uh = u / h
    in_supp = (jnp.abs(uh) < 1.0).astype(u.dtype)
    return (3.0 / 4.0) * (1.0 - uh * uh) * in_supp / h


def epanechnikov_cdf(u: jax.Array, h: float) -> jax.Array:
    uh = u / h
    in_supp = (jnp.abs(uh) <= 1.0).astype(u.dtype)
    pos = (uh > 1.0).astype(u.dtype)
    h3 = h * h * h
    cdf = ((1.0 / (4.0 * h3)) * ((3.0 * u * h * h - u * u * u) + 2.0 * h3)
           * in_supp) + (1.0 - in_supp) * pos
    return cdf


def epanechnikov_loss(u: jax.Array, h: float, alpha: float) -> jax.Array:
    # NOTE: the |uh| out-of-support term is gated on ``pos`` (uh > 1)
    # ONLY — for uh < -1 the reference returns ell = 0 even though He et
    # al. 2021 Remark 3.1 gives |uh| on BOTH tails. This replicates the
    # reference exactly (safer2.h:636-647, `abs(uh) * pos`); the Armijo
    # objective in the xi Newton step therefore shares the reference's
    # left-tail discontinuity at u = -h. Pinned by
    # tests/test_ops.py::test_epanechnikov_loss_matches_reference_tails.
    uh = u / h
    in_supp = (jnp.abs(uh) <= 1.0).astype(u.dtype)
    pos = (uh > 1.0).astype(u.dtype)
    ell = ((3.0 / 4.0) * uh * uh - (1.0 / 8.0) * uh ** 4 + 3.0 / 8.0) * in_supp \
        + jnp.abs(uh) * pos
    return 0.5 * h * ell + ((1.0 - alpha) - 0.5) * u


def kernel_fns(use_epanechnikov: bool):
    """(pdf, cdf, loss) triple selected like reference safer2.h:659-687."""
    if use_epanechnikov:
        return epanechnikov_kernel, epanechnikov_cdf, epanechnikov_loss
    return gaussian_kernel, gaussian_cdf, gaussian_loss


def dual_weight(loss: jax.Array, xi, h: float,
                use_epanechnikov: bool) -> jax.Array:
    """z-step weights: z_u = 1 - K_cdf(-(loss_u - xi); h).

    Reference safer2.h:770-776 (threaded) and safer2pp.h:847-856
    (vectorized).
    """
    _, cdf, _ = kernel_fns(use_epanechnikov)
    r = loss - xi
    return 1.0 - cdf(-r, h)
