"""SAFER2++: SAFER2 fused with iALS++-style block coordinate descent.

Capability parity with reference include/frecsys/safer2pp.h
(SAFER2ppRecommender): blockwise delta solves, a fully vectorized
z-step, and SAFER2's xi machinery. The reference's flat
prediction/residual cache (safer2pp.h:469-517, :504-508) is folded
away: every sweep recomputes predictions from the live tables, which
on TPU is cheaper than the cache's per-element gathers/scatters (see
models/common.py::block_assemble_unweighted).

  user block : A = w (sum v_loc v_loc^T / |H| + uobs G_loc) + reg I
               rhs = (w/|H|) sum v_loc (pred-1) + w uobs G_lg u + reg u_loc
               (safer2pp.h:97-159)
  item block : raw-dual-weighted local Gramians (safer2pp.h:532-544),
               wt = z/|H_u| residual rhs (safer2pp.h:161-216)
  z-step     : vectorized over the whole dual vector (safer2pp.h:839-862 —
               unlike SAFER2, id gaps are updated too)
  loss       : recomputed per-tuple (same values as the reference's
               cache-based safer2pp.h:611-652)
  train      : pd x {z, blocks x {U, V}}, V^T V, loss, xi
               (safer2pp.h:288-355)
  eval       : 8 blockwise fold-in epochs with weight 1 (safer2pp.h:220-286)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.data.dataset import DeviceData, FoldInData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.models.base import (MFState, Recommender,
                                                  SaferFamilyMixin, _log)
from safer2_recommender_tpu.ops import quantile, smoothing


class SAFER2pp(SaferFamilyMixin, Recommender):
    name = "safer2pp"

    def _log_epoch_lines(self) -> None:
        # reference safer2pp.h:325-326, :353
        self._log_weighted_loss()
        _log.info("Xi:%s", float(self.state.xi))

    def _block_sweep_u(self, u, v, buckets, s, bs, dual):
        """``s`` may be a traced block offset (scanned blocks); ``bs``
        is the static block size."""
        cfg = self.cfg
        v_loc = jax.lax.dynamic_slice_in_dim(v, s, bs, axis=1)
        g_loc = v_loc.T @ v_loc
        g_lg = v_loc.T @ v
        reg = self._user_reg()

        def assemble_fn(b):
            w = dual[jnp.minimum(b.row_ids, dual.shape[0] - 1)]
            return common.block_assemble_user_safer(
                u, v, b, s, bs, g_loc, g_lg,
                jnp.full((b.n_rows,), reg, jnp.float32),
                cfg.uobs_weight, w, dtype=self.asm_dtype)

        return common.block_solve_sweep(u, buckets, assemble_fn, s, bs)

    def _block_sweep_v(self, v, u, dd: DeviceData, s, bs, dual):
        cfg = self.cfg
        u_loc = jax.lax.dynamic_slice_in_dim(u, s, bs, axis=1)
        u_loc_w = u_loc * dual[:, None]
        g_loc_w = u_loc_w.T @ u_loc
        g_lg_w = u_loc_w.T @ u
        norm_dual = jnp.where(dd.user_hist_size > 0,
                              dual / jnp.maximum(dd.user_hist_size, 1.0),
                              0.0)

        def assemble_fn(b):
            reg = self._item_reg(dd.item_reg, b.row_ids)
            return common.block_assemble_item_safer(
                v, u, b, s, bs, g_loc_w, g_lg_w, reg,
                cfg.uobs_weight, norm_dual, dtype=self.asm_dtype)

        return common.block_solve_sweep(v, dd.by_item, assemble_fn, s, bs)

    def _epoch(self, state: MFState, dd: DeviceData) -> MFState:
        cfg = self.cfg
        u, v = state.user_emb, state.item_emb
        loss, dual = state.user_loss, state.dual_weight
        gram = state.item_gramian
        for _ in range(cfg.pd_iterations):
            # Vectorized z-step over the full dual vector
            # (safer2pp.h:839-862).
            dual = smoothing.dual_weight(loss, state.xi, cfg.bandwidth,
                                         cfg.use_epanechnikov)

            def body(carry, s, bs):
                cu, cv = carry
                cu = self._block_sweep_u(cu, cv, dd.by_user, s, bs, dual)
                cv = self._block_sweep_v(cv, cu, dd, s, bs, dual)
                return (cu, cv)

            u, v = common.blockwise((u, v), cfg.dim, cfg.block_size, body)
            gram = v.T @ v
            loss = common.user_losses(u, v, gram, dd.by_user,
                                      dd.num_users, cfg.uobs_weight,
                                      halve=True, dtype=self.asm_dtype)
        key, sub = jax.random.split(state.key)
        xi = quantile.compute_xi(
            loss, state.xi, sub, nr_iterations=cfg.xi_iterations,
            bandwidth=cfg.bandwidth, alpha=cfg.alpha,
            use_epanechnikov=cfg.use_epanechnikov, use_snr=cfg.use_snr,
            sampling_ratio=cfg.sampling_ratio)
        return state.replace(user_emb=u, item_emb=v, item_gramian=gram,
                             user_loss=loss, dual_weight=dual, xi=xi,
                             key=key, steps=state.steps + 1)

    def initialize(self, dd: DeviceData) -> None:
        """Initial losses + xi warm start (reference safer2pp.h:885-912;
        the reference's cache priming is folded away — predictions are
        recomputed wherever needed)."""
        @jax.jit
        def _init(state: MFState):
            loss = common.user_losses(
                state.user_emb, state.item_emb, state.item_gramian,
                dd.by_user, dd.num_users, self.cfg.uobs_weight,
                halve=True, dtype=self.asm_dtype)
            key, sub = jax.random.split(state.key)
            xi = quantile.compute_xi(
                loss, jnp.mean(loss), sub,
                nr_iterations=self.cfg.xi_iterations,
                bandwidth=self.cfg.bandwidth, alpha=self.cfg.alpha,
                use_epanechnikov=self.cfg.use_epanechnikov,
                use_snr=self.cfg.use_snr,
                sampling_ratio=self.cfg.sampling_ratio)
            return state.replace(user_loss=loss, xi=xi, key=key)

        self.state = _init(self.state)

    def _fold_in(self, state: MFState, fold: FoldInData) -> jax.Array:
        """8 blockwise fold-in epochs with weight 1 (reference
        safer2pp.h:220-286), scanned over epochs x blocks when uniform."""
        v = state.item_emb
        ue = jnp.zeros((fold.n_pad, self.cfg.dim), jnp.float32)
        ones = jnp.ones((fold.n_pad,), jnp.float32)
        return common.blockwise(
            ue, self.cfg.dim, self.cfg.block_size,
            lambda cu, s, bs: self._block_sweep_u(cu, v, fold.by_user, s,
                                                  bs, ones),
            repeats=self.cfg.eval_fold_in_epochs)
