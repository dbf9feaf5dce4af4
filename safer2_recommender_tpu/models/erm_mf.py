"""ERM-MF: the risk-neutral baseline of SAFER2.

Capability parity with reference include/frecsys/erm_mf.h
(ERMMFRecommender): per-user *mean* squared loss, constant dual weight
alpha, exact alternating solves with a dual-weighted item-side Gramian
(erm_mf.h:462-467), and the SAFER-family regularizers:

  user: reg * (1 + uobs * num_items)                (erm_mf.h:384-387)
  item: reg * (item_reg_v + alpha * uobs * num_users)  (erm_mf.h:389-395)
    with item_reg_v = sum_{u in H_v} 1 / |H_u|      (erm_mf.h:580-586)

Epoch = StepU (weight alpha, cached Gramian), StepV, refresh V^T V,
per-user losses (erm_mf.h:257-301).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.data.dataset import DeviceData, FoldInData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.models.base import (MFState, Recommender,
                                                  SaferFamilyMixin)
from safer2_recommender_tpu.ops import woodbury


class ERMMF(SaferFamilyMixin, Recommender):
    name = "erm_mf"

    def _log_epoch_lines(self) -> None:
        # reference erm_mf.h:277-278
        self._log_weighted_loss()

    def _step_u(self, ue, item_emb, gramian, buckets, dual, pre_list=None,
                q_prev=None):
        """Returns (new table, new eigenbasis or None)."""
        cfg = self.cfg
        reg = self._user_reg()
        eig = woodbury.maybe_eigh(gramian, cfg.dim, use_cg=cfg.use_cg,
                                  q_prev=q_prev,
                                  refresh_tol=cfg.eig_refresh_tol)

        def params_fn(b, pre=None):
            w = dual[jnp.minimum(b.row_ids, dual.shape[0] - 1)]
            return common.params_weighted_mean(
                item_emb, b, jnp.full((b.n_rows,), reg, jnp.float32),
                cfg.uobs_weight, w, dtype=self.asm_dtype, pre=pre)

        out = common.solve_sweep(ue, buckets, params_fn, gramian,
                                 eig=eig, use_cg=cfg.use_cg,
                                 cg_tol=cfg.cg_error_tolerance,
                                 cg_iters=cfg.cg_max_iterations,
                                 pre_list=pre_list)
        return out, (eig[0] if eig is not None else None)

    def _step_v(self, v, user_emb, dd: DeviceData, dual, q_prev=None):
        cfg = self.cfg
        # Weighted Gramian U^T diag(z) U over *all* rows incl. id gaps
        # (erm_mf.h:462-467 uses the full table).
        w_gram = user_emb.T @ (user_emb * dual[:, None])
        norm_dual = jnp.where(dd.user_hist_size > 0,
                              dual / jnp.maximum(dd.user_hist_size, 1.0),
                              0.0)

        eig = woodbury.maybe_eigh(w_gram, cfg.dim, use_cg=cfg.use_cg,
                                  q_prev=q_prev,
                                  refresh_tol=cfg.eig_refresh_tol)

        def params_fn(b):
            reg = self._item_reg(dd.item_reg, b.row_ids)
            return common.params_weighted_item(
                user_emb, b, reg, cfg.uobs_weight, norm_dual,
                dtype=self.asm_dtype)

        out = common.solve_sweep(v, dd.by_item, params_fn, w_gram,
                                 eig=eig, use_cg=cfg.use_cg,
                                 cg_tol=cfg.cg_error_tolerance,
                                 cg_iters=cfg.cg_max_iterations)
        return out, (eig[0] if eig is not None else None)

    def _epoch(self, state: MFState, dd: DeviceData) -> MFState:
        # The end-of-epoch ComputeUserLoss (erm_mf.h:275-276; stats-only —
        # ERM's dual weight is the constant alpha) is shifted to the top
        # of the next epoch so it shares the U-sweep's gather; the stored
        # user_loss therefore describes the carried (pre-epoch) model.
        loss, pre = common.gather_and_losses(
            state.item_emb, dd.by_user, state.user_emb,
            state.item_gramian, dd.num_users, self.cfg.uobs_weight,
            halve=True, dtype=self.asm_dtype)
        u, qn_u = self._step_u(state.user_emb, state.item_emb,
                               state.item_gramian, dd.by_user,
                               state.dual_weight, pre_list=pre,
                               q_prev=state.eig_qu)
        v, qn_v = self._step_v(state.item_emb, u, dd, state.dual_weight,
                               q_prev=state.eig_qv)
        gram = v.T @ v
        return state.replace(user_emb=u, item_emb=v, item_gramian=gram,
                             user_loss=loss, steps=state.steps + 1,
                             eig_qu=qn_u if qn_u is not None
                             else state.eig_qu,
                             eig_qv=qn_v if qn_v is not None
                             else state.eig_qv)

    def initialize(self, dd: DeviceData) -> None:
        """Pre-compute losses (reference erm_mf.h:573-587; history sizes
        and item_reg live in DeviceData)."""
        loss = jax.jit(common.user_losses, static_argnames=(
            "num_users", "uobs", "halve"))(
            self.state.user_emb, self.state.item_emb,
            self.state.item_gramian, dd.by_user,
            num_users=dd.num_users, uobs=self.cfg.uobs_weight, halve=True)
        self.state = self.state.replace(user_loss=loss)

    def _fold_in(self, state: MFState, fold: FoldInData) -> jax.Array:
        """StepU with weight 1.0 (reference erm_mf.h:234-244)."""
        ue = jnp.zeros((fold.n_pad, self.cfg.dim), jnp.float32)
        ones = jnp.ones((fold.n_pad,), jnp.float32)
        return self._step_u(ue, state.item_emb, state.item_gramian,
                            fold.by_user, ones, q_prev=state.eig_qu)[0]
