"""REAL multi-process ``jax.distributed`` tests (VERDICT r2 item 4).

Spawns two actual OS processes (localhost coordinator, gloo CPU
collectives, 4 virtual devices each), builds the 8-device GLOBAL mesh
across them, and runs SAFER2 through the genuine multi-host code path:
``parallel/mesh.py::put``'s ``make_array_from_process_local_data``
branch and the ``--distributed`` CLI flag. Results must match the
single-process run bit-for-bit-ish (same f32 math, different collective
schedules -> loose tolerance).

The reference has no distributed backend at all (pthreads only,
SURVEY.md section 2 P7); these tests back the multi-host scaling story
with executed code instead of mocks.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(extra, out_npz, num_procs=2, dev_per_proc=4, timeout=600):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(num_procs), str(i),
             str(dev_per_proc), out_npz, *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO)
        for i in range(num_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker {p.args} failed rc={p.returncode}:\n{out[-4000:]}")
    return outs


@pytest.mark.slow
def test_two_process_epoch_matches_single_process(tiny, tmp_path):
    ds, dd = tiny
    out_npz = str(tmp_path / "dist.npz")
    _spawn([], out_npz)

    from safer2_recommender_tpu import Config, get_model

    m = get_model("safer2", Config(dim=8), ds.num_users, ds.num_items)
    m.initialize(dd)
    m.train_epoch(dd)

    got = np.load(out_npz)
    np.testing.assert_allclose(got["user_emb"],
                               np.asarray(m.state.user_emb),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(got["user_loss"],
                               np.asarray(m.state.user_loss),
                               rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_two_process_cli_distributed(tiny, tmp_path):
    # End-to-end --distributed CLI run: train + held-out evaluation over
    # a 2-process global mesh must exit 0 on both processes.
    ds, _ = tiny
    rng = np.random.default_rng(3)
    rows = np.stack([ds.user_ids, ds.item_ids], 1)

    def write(path, arr):
        np.savetxt(path, arr, fmt="%d", delimiter=",", header="uid,sid",
                   comments="")

    write(tmp_path / "train.csv", rows)
    held = rows[rng.permutation(len(rows))[:600]]
    write(tmp_path / "tr.csv", held[:400])
    write(tmp_path / "te.csv", held[400:])

    out_npz = str(tmp_path / "cli.npz")
    outs = _spawn(["--cli", str(tmp_path)], out_npz)
    assert np.load(out_npz)["rc"] == 0
    # the distributed init line ran on both processes
    assert any("distributed: process 0/2" in o for o in outs)
    assert any("distributed: process 1/2" in o for o in outs)
