"""Training statistics: the reference's loss-decomposition logging.

Reproduces the ``PrintLosses`` / ``ComputeLosses`` observability surface
(reference ials.h:226-305, safer2.h:337-413):

  Loss=..  Loss_observed=(pred-1)^2 sum / num_tuples
  Loss_unobserved=sum(G_U * G_V) / n_items / n_users
  Loss_reg=sum_u ||u||^2 reg_u + sum_v ||v||^2 reg_v
  Loss_reg (user)=mean ||u||^2, Loss_reg (item)=mean ||v||^2

plus the NaN abort (the reference logs and exits, ials.h:291-296; we
raise instead so callers can handle it).
"""

from __future__ import annotations

import logging
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.data.dataset import DeviceData
from safer2_recommender_tpu.models import common

_log = logging.getLogger("safer2_recommender_tpu")


def loss_decomposition(
    user_emb: jax.Array,
    item_emb: jax.Array,
    user_loss: jax.Array,
    dd: DeviceData,
    user_reg_vec: jax.Array,   # [num_users] per-row reg value (0 at gaps)
    item_reg_vec: jax.Array,   # [num_items]
    uobs: float,
    *,
    loss_is_user_sum: bool,
) -> Tuple[jax.Array, ...]:
    """Returns (loss, loss_observed, loss_unobserved, loss_reg,
    reg_user_now, reg_item_now) — the six scalars of the reference's
    stats line."""
    # sum over tuples of (pred - 1)^2, recomputed per bucket (the
    # reference reads its prediction cache; same values).
    from safer2_recommender_tpu.ops import assemble

    def body(acc, b, _):
        u = assemble.read_rows(user_emb, b)
        if assemble.is_wide(b, item_emb.shape[1]):
            # zipf-head buckets stream (the full [N, L, d] gather this
            # used to do OOMed MSD-scale runs at the first stats line)
            return acc + jnp.sum(assemble.wide_obs(item_emb, b, u))
        emb, mask = assemble.gather_history(item_emb, b)
        p = assemble.rowwise_dot(emb, u)
        return acc + jnp.sum(jnp.square(p - 1.0) * mask)

    loss_observed = common.sweep_apply(dd.by_user, None,
                                       jnp.zeros((), jnp.float32), body)

    u_present = (dd.user_hist_size > 0).astype(jnp.float32)
    i_present = (dd.item_hist_size > 0).astype(jnp.float32)
    u_norms = jnp.sum(jnp.square(user_emb), axis=1)
    i_norms = jnp.sum(jnp.square(item_emb), axis=1)
    loss_reg = jnp.sum(u_norms * user_reg_vec * u_present) + jnp.sum(
        i_norms * item_reg_vec * i_present)
    reg_user_now = jnp.sum(u_norms * u_present)
    reg_item_now = jnp.sum(i_norms * i_present)

    user_gram = user_emb.T @ user_emb
    item_gram = item_emb.T @ item_emb
    loss_unobserved = jnp.sum(user_gram * item_gram)

    if loss_is_user_sum:
        # SAFER family logs sum of per-user losses (safer2.h:388)
        loss = jnp.sum(user_loss)
    else:
        # iALS/iALS++ log the full objective (ials.h:278-280)
        loss = loss_observed + uobs * loss_unobserved + loss_reg
    return (loss, loss_observed, loss_unobserved, loss_reg,
            reg_user_now, reg_item_now)


def log_loss_decomposition(values, dd: DeviceData, duration_ms: int) -> None:
    loss, obs, unobs, reg, reg_u, reg_i = (float(v) for v in values)
    if loss != loss:  # NaN
        _log.error("!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!")
        _log.error("NaN is detected!!")
        _log.error("!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!")
        raise FloatingPointError(
            "NaN detected in training loss (the reference aborts here, "
            "ials.h:291-296)")
    _log.info(
        "Loss=%.2f Loss_observed=%.2f Loss_unobserved=%.2f Loss_reg=%.2f "
        "Loss_reg (user)=%.2f Loss_reg (item)=%.2f",
        loss, obs / dd.nnz, unobs / dd.num_items / dd.num_users, reg,
        reg_u / dd.num_users, reg_i / dd.num_items)
    _log.info("Time=%d", duration_ms)
