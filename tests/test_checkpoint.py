"""Checkpoint/resume roundtrip (beyond-reference capability)."""

import numpy as np

from safer2_recommender_tpu import Config, get_model
from safer2_recommender_tpu.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path, tiny):
    ds, dd = tiny
    cfg = Config(dim=8, bandwidth=0.3)
    m = get_model("safer2", cfg, ds.num_users, ds.num_items)
    m.initialize(dd)
    m.train_epoch(dd)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(m.state, epoch=1)

    m2 = get_model("safer2", cfg, ds.num_users, ds.num_items)
    restored, epoch = mgr.restore(m2.state)
    assert epoch == 1
    np.testing.assert_array_equal(np.asarray(restored.user_emb),
                                  np.asarray(m.state.user_emb))
    np.testing.assert_array_equal(np.asarray(restored.user_loss),
                                  np.asarray(m.state.user_loss))
    # resumed training proceeds identically to continued training
    m2.state = restored
    m2.train_epoch(dd)
    m.train_epoch(dd)
    np.testing.assert_allclose(np.asarray(m.state.user_emb),
                               np.asarray(m2.state.user_emb), atol=1e-6)


def test_restore_empty_dir(tmp_path, tiny):
    ds, _ = tiny
    m = get_model("ials", Config(dim=8), ds.num_users, ds.num_items)
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, epoch = mgr.restore(m.state)
    assert restored is None and epoch == 0
