"""Independent dense-numpy oracles for whole training epochs.

Every equivalence test elsewhere compares two of OUR code paths; these
re-derive an epoch per row with plain numpy linear algebra straight
from the reference's math (reference ials.h:88-144,187-224 and
safer2.h:104-221,266-334) and demand the bucketed/padded/solver-order
TPU pipeline reproduce it to float tolerance. Nothing is shared with
the implementation under test except the Config values.
"""

import numpy as np
import pytest

from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model


@pytest.fixture()
def small():
    rng = np.random.default_rng(42)
    pairs = np.unique(np.stack([rng.integers(0, 90, 2500),
                                rng.integers(0, 40, 2500)], 1),
                      axis=0).astype(np.int32)
    ds = Dataset(pairs[:, 0], pairs[:, 1])
    return ds, DeviceData.build(ds)


def _adj(ds):
    by_u, by_i = {}, {}
    for u, i in zip(np.asarray(ds.user_ids), np.asarray(ds.item_ids)):
        by_u.setdefault(int(u), []).append(int(i))
        by_i.setdefault(int(i), []).append(int(u))
    return by_u, by_i


def _init_tables(model, dd):
    """Model init tables exported to original id space."""
    out = model.export_state(dd)
    return (out["user_emb"].astype(np.float64),
            out["item_emb"].astype(np.float64))


@pytest.mark.parametrize("dim", [8, 128])
def test_ials_epoch_matches_numpy_oracle(small, dim):
    # dim 8 runs the direct batched-Cholesky path; dim 128 activates
    # the Woodbury exact solves + rotated direct assembly
    # (ops/woodbury.py MIN_DIM) — both must reproduce the dense oracle.
    ds, dd = small
    cfg = Config(dim=dim, uobs_weight=0.1, l2_reg=0.003, l2_reg_exp=1.0,
                 stdev=0.1, compute_dtype="f32", seed=5)
    m = get_model("ials", cfg, ds.num_users, ds.num_items)
    u0, v0 = _init_tables(m, dd)
    by_u, by_i = _adj(ds)

    def reg(n_hist, n_choices):
        # reference ials.h:310-315
        return cfg.l2_reg * (n_hist + cfg.uobs_weight * n_choices)

    def sweep(table_self, table_other, adj, n_choices):
        # reference ials.h:317-365: G = V^T V once, then per-row exact
        # normal-equation solves against the FROZEN other side
        g = table_other.T @ table_other
        out = table_self.copy()
        for r, hist in adj.items():
            vh = table_other[hist]                       # [L, d]
            a = (cfg.uobs_weight * g + vh.T @ vh
                 + reg(len(hist), n_choices) * np.eye(cfg.dim))
            out[r] = np.linalg.solve(a, vh.sum(0))
        return out

    u1 = sweep(u0, v0, by_u, ds.num_items)
    v1 = sweep(v0, u1, by_i, ds.num_users)

    m.train_epoch(dd)
    got = m.export_state(dd)
    # f32 pipeline vs float64 oracle: absolute error grows with the
    # accumulation length (dim); observed max ~5e-5 at dim 128
    atol = 2e-5 * max(1, dim // 8)
    np.testing.assert_allclose(got["user_emb"], u1, rtol=2e-4, atol=atol)
    np.testing.assert_allclose(got["item_emb"], v1, rtol=2e-4, atol=atol)


def test_safer2_epoch_matches_numpy_oracle(small):
    # xi_iterations=0 keeps xi at its warm start (mean loss at epoch 0 —
    # safer2.h:819-838), so the oracle covers the z/U/V/Gramian/loss
    # wiring without re-deriving the Newton-Raphson machinery (that has
    # its own unit tests in test_ops.py).
    ds, dd = small
    cfg = Config(dim=8, uobs_weight=0.004, l2_reg=0.004, alpha=0.3,
                 bandwidth=0.15, xi_iterations=0, pd_iterations=1,
                 compute_dtype="f32", seed=5)
    m = get_model("safer2", cfg, ds.num_users, ds.num_items)
    m.initialize(dd)
    u0, v0 = _init_tables(m, dd)
    by_u, by_i = _adj(ds)
    nu, ni = ds.num_users, ds.num_items

    def losses(ue, ve):
        # reference safer2.h:85-101: mean observed + uobs u^T G u, / 2
        g = ve.T @ ve
        out = np.zeros(nu)
        for u, hist in by_u.items():
            p = ve[hist] @ ue[u]
            out[u] = 0.5 * (np.mean((p - 1.0) ** 2)
                            + cfg.uobs_weight * ue[u] @ g @ ue[u])
        return out

    loss0 = losses(u0, v0)
    xi = loss0.mean()       # warm start (epoch 0, steps == 0)

    # z-step (safer2.h:745-794, gaussian kernel cdf)
    from math import erf, sqrt
    dual = np.full(nu, cfg.alpha)
    for u in by_u:
        r = -(loss0[u] - xi) / cfg.bandwidth
        dual[u] = 1.0 - 0.5 * (1.0 + erf(r / sqrt(2.0)))

    # U-step (safer2.h:104-163): A = w (Σvv^T/|H| + uobs G) + reg I
    g = v0.T @ v0
    u_reg = cfg.l2_reg * (1.0 + cfg.uobs_weight * ni)
    u1 = u0.copy()
    for u, hist in by_u.items():
        vh = v0[hist]
        w = dual[u]
        a = (w * (vh.T @ vh / len(hist) + cfg.uobs_weight * g)
             + u_reg * np.eye(cfg.dim))
        u1[u] = np.linalg.solve(a, (w / len(hist)) * vh.sum(0))

    # V-step (safer2.h:166-221): dual-weighted Gramian + z/|H| weights
    gw = u1.T @ (u1 * dual[:, None])
    hist_size = np.zeros(nu)
    for u, hist in by_u.items():
        hist_size[u] = len(hist)
    item_reg_stat = np.zeros(ni)
    for i, users in by_i.items():
        item_reg_stat[i] = sum(1.0 / hist_size[u] for u in users)
    v1 = v0.copy()
    for i, users in by_i.items():
        uh = u1[users]
        wt = np.array([dual[u] / hist_size[u] for u in users])
        a = (cfg.uobs_weight * gw + (uh * wt[:, None]).T @ uh
             + cfg.l2_reg * (item_reg_stat[i] + cfg.alpha
                             * cfg.uobs_weight * nu) * np.eye(cfg.dim))
        v1[i] = np.linalg.solve(a, (uh * wt[:, None]).sum(0))

    m.train_epoch(dd)
    got = m.export_state(dd)
    np.testing.assert_allclose(got["user_emb"], u1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got["item_emb"], v1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got["dual_weight"][hist_size > 0],
                               dual[hist_size > 0], rtol=1e-4, atol=1e-5)
    # the stored loss is phase-shifted: it describes the PRE-epoch model
    # (the reference's trailing ComputeUserLoss of the previous epoch)
    np.testing.assert_allclose(got["user_loss"][hist_size > 0],
                               loss0[hist_size > 0], rtol=2e-4, atol=2e-5)
