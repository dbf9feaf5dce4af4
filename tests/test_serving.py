"""Fixed-shape compile-once serving engine (serving.py).

Beyond-reference surface (the reference can only score a fixed eval
fold, recommender.h:78-129): these pin (a) result parity with the
dynamic ``Recommender.recommend`` path, (b) the compile-once contract —
``num_compiles`` equals the number of ladder rungs touched and stays
constant under varying batch shapes, (c) pipelined streaming, batch
splitting, serving after a self-contained checkpoint restore, and the
meshed path.
"""

import jax
import numpy as np
import pytest

from safer2_recommender_tpu import Config, Dataset, get_model
from safer2_recommender_tpu.serving import Server


@pytest.fixture(scope="module")
def trained(tiny_module):
    ds, dd = tiny_module
    cfg = Config(dim=8, bandwidth=0.3)
    m = get_model("safer2", cfg, ds.num_users, ds.num_items)
    m.initialize(dd)
    m.train_epoch(dd)
    return ds, dd, m


@pytest.fixture(scope="module")
def tiny_module():
    # module-local copy of the session ``tiny`` data so this module can
    # train its own shared model without coupling to other files
    from safer2_recommender_tpu import DeviceData

    rng = np.random.default_rng(42)
    pairs = np.unique(np.stack([rng.integers(0, 150, 4000),
                                rng.integers(0, 80, 4000)], 1),
                      axis=0).astype(np.int32)
    ds = Dataset(pairs[:, 0], pairs[:, 1])
    return ds, DeviceData.build(ds)


def _request(ds, n_users, seed, hist=6):
    rng = np.random.default_rng(seed)
    users = rng.choice(ds.num_users, size=n_users, replace=False)
    u = np.repeat(users, hist).astype(np.int32)
    i = rng.integers(0, ds.num_items, u.size).astype(np.int32)
    return Dataset(u, i)


def _overlap(a: np.ndarray, b: np.ndarray) -> float:
    return np.mean([np.intersect1d(x, y).size / x.size
                    for x, y in zip(a, b)])


def test_server_matches_dynamic_recommend(trained):
    ds, dd, m = trained
    req = _request(ds, 40, seed=1)
    su, sids = Server(m, k=10).recommend(req)
    du, dids = m.recommend(req, k=10)
    np.testing.assert_array_equal(su, du)
    # different pad widths reorder float reductions at ULP level, so
    # near-tied items may swap list positions; id-space or fold-in bugs
    # would collapse the overlap to ~k/num_items
    assert _overlap(sids, dids) > 0.95


def test_server_compile_once_across_varying_shapes(trained):
    ds, dd, m = trained
    srv = Server(m, k=5, batch_sizes=(64, 512), widths=(32, 128))
    for seed, n in enumerate((3, 17, 60, 41)):
        srv.recommend(_request(ds, n, seed=seed))
    assert srv.num_compiles == 1       # all fit the (64, 32) rung
    srv.recommend(_request(ds, 100, seed=9))
    assert srv.num_compiles == 2       # (512, 32) rung
    for seed, n in enumerate((5, 64, 120, 12), start=20):
        srv.recommend(_request(ds, n, seed=seed))
    assert srv.num_compiles == 2       # steady state: zero recompiles


def test_server_ladder_extends_beyond_max_rung_width(trained):
    ds, dd, m = trained
    srv = Server(m, k=5, batch_sizes=(64,), widths=(8,))
    rng = np.random.default_rng(3)
    users = np.repeat(np.arange(4, dtype=np.int32), 20)  # history 20 > 8
    items = rng.integers(0, ds.num_items, users.size).astype(np.int32)
    u, ids = srv.recommend(Dataset(users, items))
    assert u.size == 4 and ids.shape == (4, 5)
    assert srv.num_compiles == 1


def test_server_splits_oversized_batch(trained):
    ds, dd, m = trained
    small = Server(m, k=5, batch_sizes=(8,), widths=(32,))
    big = Server(m, k=5, batch_sizes=(64,), widths=(32,))
    req = _request(ds, 20, seed=4)
    su, sids = small.recommend(req)
    bu, bids = big.recommend(req)
    np.testing.assert_array_equal(su, bu)
    assert _overlap(sids, bids) > 0.95
    assert small.num_compiles == 1     # one 8-rung program, reused 3x


def test_server_stream_matches_loop(trained):
    ds, dd, m = trained
    srv = Server(m, k=5)
    reqs = [_request(ds, n, seed=s) for s, n in enumerate((12, 30, 7))]
    streamed = list(srv.recommend_stream(reqs))
    assert len(streamed) == 3
    for req, (u, ids) in zip(reqs, streamed):
        u2, ids2 = srv.recommend(req)
        np.testing.assert_array_equal(u, u2)
        np.testing.assert_array_equal(ids, ids2)


def test_server_empty_request(trained):
    ds, dd, m = trained
    srv = Server(m, k=5)
    u, ids = srv.recommend(Dataset(np.zeros(0, np.int32),
                                   np.zeros(0, np.int32)))
    assert u.shape == (0,) and ids.shape == (0, 5)
    assert srv.num_compiles == 0       # nothing dispatched


def test_server_rejects_out_of_catalog_items(trained):
    ds, dd, m = trained
    srv = Server(m, k=5)
    bad = np.array([0, ds.num_items], np.int32)   # one past the catalog
    with pytest.raises(ValueError, match="item ids"):
        srv.recommend(Dataset(np.zeros(2, np.int32), bad))
    # negative ids via the raw-arrays form (Dataset itself rejects
    # negatives at construction)
    with pytest.raises(ValueError, match="item ids"):
        srv.recommend((np.zeros(1, np.int32), np.array([-1], np.int32)))


def test_server_after_self_contained_restore(trained, tmp_path):
    # Serving must be id-correct from a checkpoint alone (no DeviceData
    # in the restoring process) — same programs => bit-identical ids.
    from safer2_recommender_tpu.checkpoint import CheckpointManager

    ds, dd, m = trained
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(m.state, epoch=1, meta=m.checkpoint_meta())

    m2 = get_model("safer2", m.cfg, ds.num_users, ds.num_items)
    state, epoch, meta = mgr.restore_with_meta(m2.state)
    m2.state = state
    m2.load_checkpoint_meta(meta)

    req = _request(ds, 25, seed=6)
    u1, ids1 = Server(m, k=10).recommend(req)
    u2, ids2 = Server(m2, k=10).recommend(req)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(ids1, ids2)


def test_server_on_mesh(tiny_module):
    from safer2_recommender_tpu import DeviceData
    from safer2_recommender_tpu.parallel import get_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    ds, dd_single = tiny_module
    mesh = get_mesh()
    dd = DeviceData.build(ds, mesh=mesh)
    cfg = Config(dim=8, bandwidth=0.3)
    m = get_model("safer2", cfg, ds.num_users, ds.num_items, mesh=mesh)
    m.initialize(dd)
    m.train_epoch(dd)

    m1 = get_model("safer2", cfg, ds.num_users, ds.num_items)
    m1.initialize(dd_single)
    m1.train_epoch(dd_single)

    req = _request(ds, 30, seed=8)
    mu, mids = Server(m, k=10).recommend(req)
    su, sids = Server(m1, k=10).recommend(req)
    np.testing.assert_array_equal(mu, su)
    assert _overlap(mids, sids) > 0.9
