"""Test harness config.

Runs everything on a virtual 8-device CPU mesh (the reference has no
multi-device tests at all — SURVEY.md section 4; we add them). The axon
TPU plugin registers at interpreter start via sitecustomize, so the
platform override must go through jax.config, and XLA_FLAGS must be set
before first backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from safer2_recommender_tpu import Dataset, DeviceData, FoldInData  # noqa: E402

# The bundled ML-1M split (tests/ml-1m/*.csv.gz: 388,246 train tuples /
# 4,034 users / 3,468 items; 1,000 eval users) — public MovieLens-derived
# data, shipped gzipped IN THIS REPO so a bare clone runs every quality
# gate (the reference bundles the same split as bazel test data,
# reference BUILD:42-46). Override with FRECSYS_ML1M_DIR.
ML1M_DIR = os.environ.get(
    "FRECSYS_ML1M_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "ml-1m"))


def ml1m_available() -> bool:
    base = os.path.join(ML1M_DIR, "train.csv")
    return os.path.exists(base) or os.path.exists(base + ".gz")


requires_ml1m = pytest.mark.skipif(
    not ml1m_available(), reason="ML-1M fixture not available")


@pytest.fixture(scope="session")
def ml1m():
    """(train Dataset, DeviceData, FoldInData) for the bundled split."""
    if not ml1m_available():
        pytest.skip("ML-1M fixture not available")
    train = Dataset.from_csv(os.path.join(ML1M_DIR, "train.csv"))
    val_tr = Dataset.from_csv(os.path.join(ML1M_DIR, "validation_tr.csv"))
    val_te = Dataset.from_csv(os.path.join(ML1M_DIR, "validation_te.csv"))
    dd = DeviceData.build(train)
    fold = FoldInData.build(val_tr, val_te, num_items=train.num_items)
    return train, dd, fold


@pytest.fixture(scope="session")
def tiny():
    """Small synthetic dataset for fast unit tests."""
    rng = np.random.default_rng(42)
    n, num_u, num_i = 4000, 150, 80
    u = rng.integers(0, num_u, n).astype(np.int32)
    i = rng.integers(0, num_i, n).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    ds = Dataset(pairs[:, 0], pairs[:, 1])
    dd = DeviceData.build(ds)
    return ds, dd
