"""SAFER2++: SAFER2 fused with iALS++-style block coordinate descent.

Capability parity with reference include/frecsys/safer2pp.h
(SAFER2ppRecommender): blockwise delta solves, a fully vectorized
z-step, and SAFER2's xi machinery.

  user block : A = w (sum v_loc v_loc^T / |H| + uobs G_loc) + reg I
               rhs = (w/|H|) sum v_loc (pred-1) + w uobs G_lg u + reg u_loc
               (safer2pp.h:97-159)
  item block : raw-dual-weighted Gramian slices (safer2pp.h:532-544),
               wt = z/|H_u| residual rhs (safer2pp.h:161-216)
  z-step     : vectorized over the whole dual vector (safer2pp.h:839-862 —
               unlike SAFER2, id gaps are updated too)
  train      : pd x {z, U block sweep, V block sweep}, V^T V, loss, xi
               (safer2pp.h:288-355; the reference interleaves U/V per
               block — see models/common.py::block_sweep_frozen for the
               reordering and its equivalence argument)
  eval       : 8 blockwise fold-in epochs with weight 1 (safer2pp.h:220-286)

The reference's flat prediction/residual cache (safer2pp.h:469-517,
:504-508) becomes slab-local incremental predictions inside each
bucket's sweep; the per-user loss (safer2pp.h:611-652) is recomputed
from the live tables (same values, no cache drift).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.data.dataset import DeviceData, FoldInData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.models.base import (MFState, Recommender,
                                                  SaferFamilyMixin, _log)
from safer2_recommender_tpu.ops import quantile, smoothing, woodbury


class SAFER2pp(SaferFamilyMixin, Recommender):
    name = "safer2pp"

    @property
    def _loss_lags_one_epoch(self) -> bool:
        # In interleaved mode the stored loss is computed at end of
        # epoch from the carried prediction cache — it does NOT lag.
        return not (self.cfg.block_interleaved
                    and self.cfg.dim % self.cfg.block_size == 0)

    def _log_epoch_lines(self) -> None:
        # reference safer2pp.h:325-326, :353
        self._log_weighted_loss()
        _log.info("Xi:%s", float(self.state.xi))

    def _spec_u(self, dual: jax.Array):
        """User-side coefficients (reference safer2pp.h:97-159):
        ch = w/|H|, cg = w*uobs, scalar user reg (safer2.h:418-421)."""
        cfg = self.cfg
        reg = self._user_reg()

        def spec_fn(b):
            w = dual[jnp.minimum(b.row_ids, dual.shape[0] - 1)]
            return common.BlockSpec(
                ch=w / common.safe_len(b),
                cg=cfg.uobs_weight * w,
                reg=jnp.full((b.n_rows,), reg, jnp.float32))
        return spec_fn

    def _spec_v(self, dd: DeviceData):
        """Item-side coefficients (reference safer2pp.h:161-216): the
        z/|H| slot weights ride ``extra_vec``; per-item reg statistic."""
        cfg = self.cfg

        def spec_fn(b):
            return common.BlockSpec(
                cg=jnp.full((b.n_rows,), cfg.uobs_weight, jnp.float32),
                reg=self._item_reg(dd.item_reg, b.row_ids))
        return spec_fn

    def _epoch(self, state: MFState, dd: DeviceData) -> MFState:
        """One Train call, phase-shifted exactly like SAFER2._epoch.

        Reference epoch = predict; pd x {z, U blocks, V blocks, gram,
        loss}; xi (safer2pp.h:288-355) with Initialize pre-computing
        loss and xi(warm=mean) (safer2pp.h:885-912). Nothing mutates
        (u, v) between one epoch's trailing {gram, loss, xi} and the
        next epoch's leading z, so the identical update sequence runs
        as pd x {loss, [xi at t=0], z, U, V, gram} — and the loss pass
        then shares its [N, L, d] slab gathers with the U sweep
        (gather_and_losses -> pre_list), removing a full per-epoch
        gather pass over every user history."""
        cfg = self.cfg
        u, v = state.user_emb, state.item_emb
        loss, dual = state.user_loss, state.dual_weight
        gram = state.item_gramian
        xi, key = state.xi, state.key
        eq_u, eq_v = state.eig_qu, state.eig_qv
        from safer2_recommender_tpu.models.ialspp import (
            _warn_interleaved_fallback)
        _warn_interleaved_fallback(self)   # runs at trace time, once

        def xi_step(loss, warm, key):
            key, sub = jax.random.split(key)
            return quantile.compute_xi(
                loss, warm, sub, nr_iterations=cfg.xi_iterations,
                bandwidth=cfg.bandwidth, alpha=cfg.alpha,
                use_epanechnikov=cfg.use_epanechnikov,
                use_snr=cfg.use_snr,
                sampling_ratio=cfg.sampling_ratio), key

        if cfg.pd_iterations == 0:
            # trailing ComputeXi still runs on the carried loss
            # (safer2pp.h:352-354); phase-shifted = leading xi alone
            warm = jnp.where(state.steps == 0, jnp.mean(loss), xi)
            xi, key = xi_step(loss, warm, key)
        if cfg.block_interleaved and cfg.dim % cfg.block_size == 0:
            # Reference-order mode (safer2pp.h:303-319): per block,
            # StepU then StepV against LIVE Gramians; the carried
            # prediction slots (= the reference's cache) supply both
            # the residual rhs and the end-of-iteration loss, so no
            # fresh loss gather pass exists in this mode.
            for t in range(cfg.pd_iterations):
                if t == 0:
                    warm = jnp.where(state.steps == 0, jnp.mean(loss), xi)
                    xi, key = xi_step(loss, warm, key)
                dual = smoothing.dual_weight(loss, xi, cfg.bandwidth,
                                             cfg.use_epanechnikov)
                norm_dual = jnp.where(
                    dd.user_hist_size > 0,
                    dual / jnp.maximum(dd.user_hist_size, 1.0), 0.0)
                u, v, preds_u = common.block_sweep_interleaved(
                    u, v, dd.by_user, dd.by_item,
                    self._spec_u(dual), self._spec_v(dd),
                    bs=cfg.block_size, dtype=self.asm_dtype,
                    extra_vec_v=norm_dual, g_weight_v=dual)
                gram = v.T @ v
                loss = common.losses_from_preds(
                    preds_u, dd.by_user, u, gram, dd.num_users,
                    cfg.uobs_weight, mean=True, halve=True)
            return state.replace(user_emb=u, item_emb=v,
                                 item_gramian=gram, user_loss=loss,
                                 dual_weight=dual, xi=xi, key=key,
                                 steps=state.steps + 1,
                                 eig_qu=eq_u, eig_qv=eq_v)
        for t in range(cfg.pd_iterations):
            loss, pre = common.gather_and_losses(
                v, dd.by_user, u, gram, dd.num_users, cfg.uobs_weight,
                halve=True, dtype=self.asm_dtype)
            if t == 0:
                warm = jnp.where(state.steps == 0, jnp.mean(loss), xi)
                xi, key = xi_step(loss, warm, key)
            # Vectorized z-step over the full dual vector
            # (safer2pp.h:839-862).
            dual = smoothing.dual_weight(loss, xi, cfg.bandwidth,
                                         cfg.use_epanechnikov)
            # (Q, lam) of each sweep's frozen Gramian: Woodbury-eligible
            # buckets run one full-dim block (block_sweep_frozen)
            eig_u = woodbury.maybe_eigh(gram, cfg.dim, use_cg=False,
                                        q_prev=eq_u,
                                        refresh_tol=cfg.eig_refresh_tol)
            u = common.block_sweep_frozen(
                u, v, dd.by_user, gram, self._spec_u(dual),
                bs=cfg.block_size, dtype=self.asm_dtype, eig=eig_u,
                pre_list=pre)
            # Raw-dual-weighted user Gramian: every V block's
            # G_loc_w/G_lg_w (safer2pp.h:532-544) is a slice of it.
            g_w = u.T @ (u * dual[:, None])
            norm_dual = jnp.where(
                dd.user_hist_size > 0,
                dual / jnp.maximum(dd.user_hist_size, 1.0), 0.0)
            eig_v = woodbury.maybe_eigh(g_w, cfg.dim, use_cg=False,
                                        q_prev=eq_v,
                                        refresh_tol=cfg.eig_refresh_tol)
            v = common.block_sweep_frozen(
                v, u, dd.by_item, g_w, self._spec_v(dd),
                bs=cfg.block_size, dtype=self.asm_dtype,
                extra_vec=norm_dual, eig=eig_v)
            if eig_u is not None:
                eq_u, eq_v = eig_u[0], eig_v[0]
            gram = v.T @ v
        return state.replace(user_emb=u, item_emb=v, item_gramian=gram,
                             user_loss=loss, dual_weight=dual, xi=xi,
                             key=key, steps=state.steps + 1,
                             eig_qu=eq_u, eig_qv=eq_v)

    def initialize(self, dd: DeviceData) -> None:
        """Reference safer2pp.h:885-912. The loss/xi warm start now runs
        at the top of the first epoch (see ``_epoch``); here we only
        compute the loss so the pre-training state is inspectable. The
        reference's cache priming is folded away — predictions are
        recomputed wherever needed."""
        self._note_perms(dd)
        @jax.jit
        def _init(state: MFState, dd_: DeviceData):
            loss = common.user_losses(
                state.user_emb, state.item_emb, state.item_gramian,
                dd_.by_user, dd_.num_users, self.cfg.uobs_weight,
                halve=True, dtype=self.asm_dtype)
            return state.replace(user_loss=loss, steps=jnp.int32(0))

        # dd as argument (multi-process meshes forbid array closures)
        self.state = _init(self.state, dd)

    def _fold_in(self, state: MFState, fold: FoldInData) -> jax.Array:
        """8 blockwise fold-in epochs with weight 1 (reference
        safer2pp.h:220-286); the frozen item table means one slab gather
        per bucket serves all 8 sweeps.

        The fold-in trajectory FOLLOWS the training mode
        (cfg.block_interleaved). In reference-order mode the sweeps
        stay genuinely blockwise (eig=None): the reference's eval
        contract is 8 INCOMPLETE block sweeps from zero init, whose
        non-convergence regularizes the held-out users — with
        interleaved-trained tables that lands within reference reseed
        noise on the under-regularized dim-512 config (0.2794 vs ref
        0.2790..0.2801 NDCG@20 — BASELINE.md "Interleaved mode
        records", 2026-08-20). In the default fast mode the sweeps
        collapse to one exact solve via full-dim Woodbury, CONSISTENT
        with the training trajectory (++ == exact solver); the
        measured fold-in mixing A/B is in the same BASELINE.md table.
        FRT_FOLDIN_EXACT / FRT_FOLDIN_BLOCKWISE override for A/Bs."""
        ue = jnp.zeros((fold.n_pad, self.cfg.dim), jnp.float32)
        ones = jnp.ones((fold.n_pad,), jnp.float32)
        blockwise = ((self.cfg.block_interleaved
                      or os.environ.get("FRT_FOLDIN_BLOCKWISE") == "1")
                     and os.environ.get("FRT_FOLDIN_EXACT") != "1")
        eig = None
        if not blockwise:
            eig = woodbury.maybe_eigh(state.item_gramian, self.cfg.dim,
                                      use_cg=False, q_prev=state.eig_qu,
                                      refresh_tol=self.cfg.eig_refresh_tol)
        return common.block_sweep_frozen(
            ue, state.item_emb, fold.by_user, state.item_gramian,
            self._spec_u(ones), bs=self.cfg.block_size,
            n_sweeps=self.cfg.eval_fold_in_epochs, dtype=self.asm_dtype,
            eig=eig)
