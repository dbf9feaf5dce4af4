"""Data-layer invariants: the bucketed layout must reproduce the COO set."""

import numpy as np

from safer2_recommender_tpu import Dataset, DeviceData, FoldInData


def _pairs_from_buckets(buckets, nnz):
    """Recover (row, col, tuple_idx) triples from padded buckets."""
    rows, cols, tidx = [], [], []
    for b in buckets:
        r = np.asarray(b.row_ids)
        c = np.asarray(b.col_ids)
        t = np.asarray(b.tuple_idx)
        ln = np.asarray(b.length)
        for k in range(r.shape[0]):
            if ln[k] == 0:
                continue
            rows.extend([r[k]] * int(ln[k]))
            cols.extend(c[k, : ln[k]])
            tidx.extend(t[k, : ln[k]])
    return np.array(rows), np.array(cols), np.array(tidx)


def test_roundtrip(tiny):
    ds, dd = tiny
    rows, cols, tidx = _pairs_from_buckets(dd.by_user, ds.nnz)
    assert len(rows) == ds.nnz
    # every tuple gets a distinct cache position inside the slab buffer
    assert len(np.unique(tidx)) == ds.nnz
    assert tidx.max() < dd.pred_size
    # by_user recovers the COO multiset
    assert sorted(zip(rows.tolist(), cols.tolist())) == sorted(
        zip(ds.user_ids.tolist(), ds.item_ids.tolist()))
    # both views must agree on each tuple's cache position
    pos_to_ui = {int(t): (int(r), int(c))
                 for r, c, t in zip(rows, cols, tidx)}
    rows_i, cols_i, tidx_i = _pairs_from_buckets(dd.by_item, ds.nnz)
    assert len(rows_i) == ds.nnz
    assert all(pos_to_ui[int(t)] == (int(c), int(r))
               for r, c, t in zip(rows_i, cols_i, tidx_i))


def test_hist_and_reg_stats(tiny):
    ds, dd = tiny
    uh = np.zeros(ds.num_users)
    np.add.at(uh, ds.user_ids, 1)
    assert np.array_equal(np.asarray(dd.user_hist_size), uh)
    # item_reg = sum over the item's users of 1/|H_u| (safer2.h:831-837)
    ireg = np.zeros(ds.num_items)
    for u, i in zip(ds.user_ids, ds.item_ids):
        ireg[i] += 1.0 / uh[u]
    np.testing.assert_allclose(np.asarray(dd.item_reg), ireg, rtol=1e-5)


def test_padding_sentinels(tiny):
    ds, dd = tiny
    slabs = []
    for b in dd.by_user:
        r = np.asarray(b.row_ids)
        ln = np.asarray(b.length)
        t = np.asarray(b.tuple_idx)
        assert np.all(r[ln == 0] == dd.num_users)
        # by_user buckets own contiguous cache slabs: position =
        # slab offset + row*width + col for EVERY slot
        n, width = t.shape
        expect = t[0, 0] + (np.arange(n)[:, None] * width
                            + np.arange(width)[None, :])
        assert np.array_equal(t, expect)
        slabs.append((int(t[0, 0]), n * width))
    # slabs tile [0, pred_size) without gaps or overlap
    slabs.sort()
    assert slabs[0][0] == 0
    for (o1, s1), (o2, _) in zip(slabs, slabs[1:]):
        assert o1 + s1 == o2
    assert slabs[-1][0] + slabs[-1][1] == dd.pred_size
    for b in dd.by_item:
        ln = np.asarray(b.length)
        t = np.asarray(b.tuple_idx)
        # padded by-item slots point out of bounds (dropped by scatters)
        pos = np.arange(t.shape[1])[None, :]
        pad_mask = pos >= ln[:, None]
        assert np.all(t[pad_mask] == dd.pred_size)


def test_fold_in_data(tiny):
    ds, _ = tiny
    # use one half as "tr", other half as "te"
    half = ds.nnz // 2
    tr = Dataset(ds.user_ids[:half], ds.item_ids[:half])
    te = Dataset(ds.user_ids[half:], ds.item_ids[half:])
    fold = FoldInData.build(tr, te, num_items=ds.num_items)
    uniq = np.unique(tr.user_ids)
    assert fold.n_eval == uniq.size
    gt = np.asarray(fold.gt)
    gt_len = np.asarray(fold.gt_len)
    # ground truth rows must match te restricted to tr users
    for row in range(min(fold.n_eval, 20)):
        uid = uniq[row]
        expected = np.sort(te.item_ids[te.user_ids == uid])
        got = np.sort(gt[row, : gt_len[row]])
        assert np.array_equal(got, expected)


def test_bucket_splitting_matches_unsplit():
    # Tiny memory budget forces bucket row-chunking; training must be
    # numerically identical to the unsplit layout.
    import jax.numpy as jnp

    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model

    rng = np.random.default_rng(0)
    n = 4000
    pairs = np.unique(np.stack([rng.integers(0, 150, n),
                                rng.integers(0, 80, n)], 1), axis=0)
    ds = Dataset(pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32))

    dd_full = DeviceData.build(ds)
    dd_split = DeviceData.build(ds, dim=16,
                                memory_budget_bytes=64 * 16 * 16 * 4 * 3)
    assert len(dd_split.by_user) > len(dd_full.by_user)

    outs = []
    for dd in (dd_full, dd_split):
        m = get_model("ials", Config(dim=16, seed=7), ds.num_users,
                      ds.num_items)
        m.train_epoch(dd)
        outs.append(np.asarray(m.state.user_emb))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)


def test_bucket_stacks_scan_matches_unsplit():
    # Heavier chunking makes several same-shape chunks per width; those
    # run as one lax.scan (models/common.py::BucketStack). Training must
    # stay numerically identical to the unsplit layout for both the
    # exact-solve and the blockwise model families.
    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    from safer2_recommender_tpu.models import common

    rng = np.random.default_rng(1)
    pairs = np.unique(np.stack([rng.integers(0, 300, 6000),
                                rng.integers(0, 120, 6000)], 1),
                      axis=0).astype(np.int32)
    ds = Dataset(pairs[:, 0], pairs[:, 1])
    dd_plain = DeviceData.build(ds)
    dd_chunked = DeviceData.build(ds, dim=16, memory_budget_bytes=64 * 1024)
    assert any(isinstance(g, common.BucketStack)
               for g in common.group_same_shape(dd_chunked.by_user))

    for name in ("safer2", "safer2pp"):
        outs = []
        for dd in (dd_plain, dd_chunked):
            m = get_model(name,
                          Config(dim=16, block_size=8, bandwidth=0.15,
                                 alpha=0.3, seed=3),
                          ds.num_users, ds.num_items)
            m.initialize(dd)
            m.train_epoch(dd)
            outs.append(np.asarray(m.state.user_emb))
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)


def test_wide_streamed_assembly_matches_dense(monkeypatch):
    # Zipf-head rows (hot items with 10^5+ users at MSD scale) stream
    # their history through column chunks (ops/assemble.py::wide_*)
    # instead of materializing the [N, L, d] slab; the result must match
    # the dense path exactly.
    from safer2_recommender_tpu import Config, Dataset, DeviceData, get_model
    import safer2_recommender_tpu.ops.assemble as assemble

    rng = np.random.default_rng(2)
    hot = np.stack([np.arange(600), np.zeros(600, dtype=np.int64)], 1)
    tail = np.stack([rng.integers(0, 600, 5000),
                     rng.integers(1, 80, 5000)], 1)
    pairs = np.unique(np.concatenate([hot, tail]), axis=0).astype(np.int32)
    ds = Dataset(pairs[:, 0], pairs[:, 1])
    dd = DeviceData.build(ds)

    def run(name):
        m = get_model(name, Config(dim=16, bandwidth=0.15, alpha=0.3,
                                   seed=5), ds.num_users, ds.num_items)
        m.initialize(dd)
        m.train_epoch(dd)
        return np.asarray(m.state.item_emb), np.asarray(m.state.user_loss)

    for name in ("safer2", "cvar_mf"):
        v_ref, l_ref = run(name)
        monkeypatch.setattr(assemble, "WIDE_SLAB_BYTES", 1)
        monkeypatch.setattr(assemble, "WIDE_CHUNK", 256)
        v_wide, l_wide = run(name)
        monkeypatch.undo()
        np.testing.assert_allclose(v_wide, v_ref, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(l_wide, l_ref, rtol=2e-4, atol=2e-5)
