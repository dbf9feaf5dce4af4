"""iALS++: block coordinate descent over embedding sub-blocks.

Capability parity with reference include/frecsys/ialspp.h
(IALSppRecommender, the "subspace optimization" of the iALS++ paper):
delta solves over blocks of size ``block_size``:

  A = uobs * G_loc + reg * I + sum_h v_loc v_loc^T
  rhs = sum_h v_loc (pred - 1) + uobs * G_lg @ x + reg * x_loc
  x_loc <- x_loc - A^-1 rhs                        (ialspp.h:85-145)

Train epoch = per block {user sweep, item sweep} (ialspp.h:208-261).
The reference's flat prediction cache with lock-free racy scatters
(ialspp.h:399-406, :469-517) is folded away: each sweep recomputes
``pred`` from the live tables, which on TPU beats maintaining a
per-tuple cache (models/common.py::block_assemble_unweighted).
Held-out eval = 8 blockwise fold-in epochs (ialspp.h:149-206,
num_epochs hard-coded at :152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from safer2_recommender_tpu.data.dataset import DeviceData, FoldInData
from safer2_recommender_tpu.models import common
from safer2_recommender_tpu.models.base import MFState, Recommender


class IALSpp(Recommender):
    name = "ialspp"
    _stats_order = "post"

    def _reg_vectors(self, dd: DeviceData):
        cfg = self.cfg
        ur = common.ials_reg(dd.user_hist_size, dd.num_items, cfg.l2_reg,
                             cfg.l2_reg_exp, cfg.uobs_weight)
        ir = common.ials_reg(dd.item_hist_size, dd.num_users, cfg.l2_reg,
                             cfg.l2_reg_exp, cfg.uobs_weight)
        return ur, ir

    def _block_sweep(self, table_self, table_other, buckets,
                     s, bs, num_choices):
        """One Step over one side for one block (reference
        ialspp.h:351-424). ``s`` may be a traced offset (scanned blocks,
        see ``common.block_solve_sweep``); ``bs`` is static."""
        cfg = self.cfg
        other_loc = jax.lax.dynamic_slice_in_dim(table_other, s, bs,
                                                 axis=1)
        g_loc = other_loc.T @ other_loc
        g_lg = other_loc.T @ table_other

        def assemble_fn(b):
            reg = common.ials_reg(b.length, num_choices, cfg.l2_reg,
                                  cfg.l2_reg_exp, cfg.uobs_weight)
            return common.block_assemble_unweighted(
                table_self, table_other, b, s, bs, g_loc, g_lg,
                reg, cfg.uobs_weight, dtype=self.asm_dtype)

        return common.block_solve_sweep(table_self, buckets,
                                        assemble_fn, s, bs)

    def _epoch(self, state: MFState, dd: DeviceData) -> MFState:
        def body(carry, s, bs):
            cu, cv = carry
            cu = self._block_sweep(cu, cv, dd.by_user, s, bs,
                                   dd.num_items)
            cv = self._block_sweep(cv, cu, dd.by_item, s, bs,
                                   dd.num_users)
            return (cu, cv)

        u, v = common.blockwise((state.user_emb, state.item_emb),
                                self.cfg.dim, self.cfg.block_size, body)
        gram = v.T @ v
        loss = common.user_losses(u, v, gram, dd.by_user, dd.num_users,
                                  self.cfg.uobs_weight, halve=False, dtype=self.asm_dtype)
        return state.replace(user_emb=u, item_emb=v, item_gramian=gram,
                             user_loss=loss, steps=state.steps + 1)

    def _fold_in(self, state: MFState, fold: FoldInData) -> jax.Array:
        """8 blockwise fold-in epochs (reference ialspp.h:149-206),
        scanned as one sweep body over epochs x blocks when uniform."""
        v = state.item_emb
        ue = jnp.zeros((fold.n_pad, self.cfg.dim), jnp.float32)
        return common.blockwise(
            ue, self.cfg.dim, self.cfg.block_size,
            lambda cu, s, bs: self._block_sweep(cu, v, fold.by_user, s,
                                                bs, self.num_items),
            repeats=self.cfg.eval_fold_in_epochs)
