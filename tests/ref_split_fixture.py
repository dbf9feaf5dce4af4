"""Frozen re-implementation of the REFERENCE data-prep protocol,
used as a CI-portable cross-check fixture (VERDICT r4 next-round #7).

The reference's scripts/generate_data.py (pandas: filter_triplets ->
seed-98765 user permutation -> heldout slicing -> per-user 80/20 split)
only exists on machines with the reference tree; vendoring its behavior
here lets test_generate.py's protocol cross-check run in any CI. This
is NOT a copy of that script: it is numpy-based (the reference is
pandas/groupby) but consumes the legacy ``np.random`` stream with the
exact same call sequence — same seed resets, same ``permutation`` /
``choice`` calls in the same order — so its outputs are BIT-IDENTICAL
to the reference script's. ``test_generate.py::
test_vendored_fixture_matches_real_reference`` asserts that byte
equality whenever the reference tree is present.

Not part of the framework; test fixture only.
"""

from __future__ import annotations

import os

import numpy as np


def _filter(users: np.ndarray, items: np.ndarray, min_uc: int,
            min_sc: int):
    """Reference filter_triplets: item min-count filter first, then user
    min-count filter, single pass (items may dip below min_sc again
    after the user filter — the protocol keeps them)."""
    if min_sc > 0:
        iu, ic = np.unique(items, return_counts=True)
        m = np.isin(items, iu[ic >= min_sc])
        users, items = users[m], items[m]
    if min_uc > 0:
        uu, uc = np.unique(users, return_counts=True)
        m = np.isin(users, uu[uc >= min_uc])
        users, items = users[m], items[m]
    return users, items


def _split_80_20(users: np.ndarray, items: np.ndarray):
    """Reference split_train_test_proportion: seed reset to 98765, users
    visited in sorted order (pandas groupby), one ``np.random.choice(n,
    int(0.2*n), replace=False)`` per user with >= 5 tuples; rows keep
    file order within each user."""
    np.random.seed(98765)
    order = np.argsort(users, kind="stable")
    su, si = users[order], items[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(su[1:] != su[:-1]) + 1, [su.size]))
    tr_sel, te_sel = [], []
    for a, b in zip(starts[:-1], starts[1:]):
        n = b - a
        if n >= 5:
            te = np.zeros(n, dtype=bool)
            te[np.random.choice(n, size=int(0.2 * n),
                                replace=False).astype("int64")] = True
            tr_sel.append(np.arange(a, b)[~te])
            te_sel.append(np.arange(a, b)[te])
        else:
            tr_sel.append(np.arange(a, b))
    tr = np.concatenate(tr_sel) if tr_sel else np.zeros(0, np.int64)
    te = np.concatenate(te_sel) if te_sel else np.zeros(0, np.int64)
    return (su[tr], si[tr]), (su[te], si[te])


def generate_reference_splits(users, items, output_dir: str,
                              n_heldout_users: int, min_uc: int,
                              min_sc: int) -> None:
    """The reference's generate_data(), file for file."""
    users = np.asarray(users)
    items = np.asarray(items)
    users, items = _filter(users, items, min_uc, min_sc)

    unique_uid = np.unique(users)            # groupby index: sorted
    np.random.seed(98765)
    unique_uid = unique_uid[np.random.permutation(unique_uid.size)]
    n = unique_uid.size
    tr_users = unique_uid[: n - 2 * n_heldout_users]
    vd_users = unique_uid[n - 2 * n_heldout_users: n - n_heldout_users]
    te_users = unique_uid[n - n_heldout_users:]

    tr_mask = np.isin(users, tr_users)
    tr_items = items[tr_mask]
    # train catalog in FIRST-APPEARANCE order (pd.unique semantics)
    _, first = np.unique(tr_items, return_index=True)
    unique_sid = tr_items[np.sort(first)]
    sid_pos = {s: i for i, s in enumerate(unique_sid.tolist())}
    uid_pos = {u: i for i, u in enumerate(unique_uid.tolist())}

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "unique_sid.txt"), "w") as f:
        for s in unique_sid.tolist():
            f.write(f"{s}\n")

    def write(name, us, its):
        with open(os.path.join(output_dir, name), "w") as f:
            f.write("uid,sid\n")
            for u, i in zip(us.tolist(), its.tolist()):
                f.write(f"{uid_pos[u]},{sid_pos[i]}\n")

    write("train.csv", users[tr_mask], tr_items)
    for name, heldout in (("validation", vd_users), ("test", te_users)):
        m = np.isin(users, heldout) & np.isin(items, unique_sid)
        (utr, itr), (ute, ite) = _split_80_20(users[m], items[m])
        write(f"{name}_tr.csv", utr, itr)
        write(f"{name}_te.csv", ute, ite)
