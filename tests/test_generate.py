"""Dataset-prep pipeline tests (capability of reference
scripts/generate_data.py, checked on synthetic raw data)."""

import os

import numpy as np
import pytest

from safer2_recommender_tpu.data import generate


@pytest.fixture()
def raw():
    rng = np.random.default_rng(7)
    n = 30000
    users = rng.integers(0, 800, n)
    items = rng.zipf(1.5, n) % 400
    return users, items


def test_generate_splits(tmp_path, raw):
    users, items = raw
    spec = generate.DatasetSpec(n_heldout_users=50, min_uc=5, min_sc=3,
                                binarize=False)
    stats = generate.generate_splits(users, items, str(tmp_path), spec)
    for f in ("train.csv", "validation_tr.csv", "validation_te.csv",
              "test_tr.csv", "test_te.csv", "unique_sid.txt"):
        assert os.path.exists(tmp_path / f)

    import pandas as pd

    train = pd.read_csv(tmp_path / "train.csv")
    vtr = pd.read_csv(tmp_path / "validation_tr.csv")
    vte = pd.read_csv(tmp_path / "validation_te.csv")
    ttr = pd.read_csv(tmp_path / "test_tr.csv")

    assert len(train) == stats["train"]
    # user populations are disjoint
    assert not set(train.uid) & set(vtr.uid)
    assert not set(train.uid) & set(ttr.uid)
    assert not set(vtr.uid) & set(ttr.uid)
    # te users subset of tr users; items only from the train catalog
    assert set(vte.uid) <= set(vtr.uid)
    n_items = train.sid.max() + 1
    for df in (vtr, vte, ttr):
        assert df.sid.max() < n_items
    # dense train item ids (first-appearance order)
    assert set(np.unique(train.sid)) == set(range(n_items))
    # the te share per user is ~20% of each held-out user's tuples
    both = pd.concat([vtr, vte])
    per_user = both.groupby("uid").size()
    te_per_user = vte.groupby("uid").size().reindex(per_user.index,
                                                    fill_value=0)
    expect = (0.2 * per_user).astype(int)
    big = per_user[per_user >= 5].index
    assert (te_per_user[big] == expect[big]).all()


def test_min_count_filters(raw):
    users, items = raw
    u2, i2 = generate._filter_rare(users, items, min_uc=10, min_sc=8)
    _, uc = np.unique(u2, return_counts=True)
    assert uc.min() >= 10


def test_cv_seeds_deterministic():
    a, b = generate.cv_seeds(), generate.cv_seeds()
    assert np.array_equal(a, b)
    assert len(a) == 50


def test_generate_splits_rejects_too_few_users(tmp_path, raw):
    users, items = raw
    spec = generate.DatasetSpec(n_heldout_users=10**6, min_uc=1, min_sc=1,
                                binarize=False)
    with pytest.raises(ValueError, match="heldout"):
        generate.generate_splits(users, items, str(tmp_path), spec)
