"""Device-sharded checkpoint/resume (beyond-reference capability).

The reference has **no** serialization anywhere — embeddings live only in
RAM and a crashed run restarts from scratch (SURVEY.md section 5). We add
orbax-based checkpointing of the full MFState pytree (sharded arrays
save/restore with their shardings), with a numpy ``.npz`` fallback when
orbax is unavailable.

Id spaces: the saved tables/vectors are in the SOLVER-ORDER id space of
the DeviceData they were trained against (data/dataset.py::
_solver_order). Since format v2 the checkpoint is SELF-CONTAINED: a
``meta_{epoch}.npz`` sidecar persists the id orders (``user_order`` /
``item_order``), a fingerprint of the training DeviceData, and a format
version, so a restore into a fresh process can evaluate / serve / export
in correct original ids without ever rebuilding the DeviceData
(``Recommender.load_checkpoint_meta``). The sidecar is plain npz under
BOTH backends — orbax step layout stays untouched, and a directory
written by one backend restores under the other.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np

_log = logging.getLogger("safer2_recommender_tpu")


def _field_dict(state) -> dict:
    """Shallow {name: leaf} view of a dataclass state.

    ``dataclasses.asdict`` deep-copies every leaf (a full device-buffer
    copy of both embedding tables per save/restore at MSD scale); the
    checkpoint only needs the references.
    """
    return {f.name: getattr(state, f.name)
            for f in dataclasses.fields(state)}


class CheckpointManager:
    """Save/restore MFState pytrees keyed by epoch."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        try:
            import orbax.checkpoint as ocp
        except ImportError:
            # Only a missing orbax selects the npz fallback; a real setup
            # failure (corrupt checkpoint dir, bad options) must surface,
            # not silently retrain from scratch.
            self._ocp = None
            self._mgr = None
        else:
            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=3),
            )

    def save(self, state, epoch: int, meta: Optional[dict] = None) -> None:
        """Persist ``state`` (and, since format v2, the id-space ``meta``
        from ``Recommender.checkpoint_meta()`` — the solver-order id
        permutations that make the checkpoint self-contained)."""
        if self._mgr is not None:
            self._mgr.save(
                epoch, args=self._ocp.args.StandardSave(
                    _field_dict(state)))
            self._mgr.wait_until_finished()
        else:
            leaves = {
                k: np.asarray(v) for k, v in _field_dict(state).items()
            }
            np.savez(os.path.join(self.directory, f"state_{epoch}.npz"),
                     **leaves)
            with open(os.path.join(self.directory, "latest.json"), "w") as f:
                json.dump({"epoch": epoch}, f)
        if meta is not None:
            np.savez(os.path.join(self.directory, f"meta_{epoch}.npz"),
                     **meta)
        self._prune_npz("state", keep=3)
        self._prune_npz("meta", keep=3)
        _log.info("Saved checkpoint at epoch %d", epoch)

    def _prune_npz(self, prefix: str, keep: int) -> None:
        """Match the orbax backend's max_to_keep — two full embedding
        tables per save add up fast at scale."""
        import glob

        paths = glob.glob(os.path.join(self.directory, f"{prefix}_*.npz"))
        by_epoch = sorted(
            paths, key=lambda p: int(
                os.path.basename(p)[len(prefix) + 1:-len(".npz")]))
        for p in by_epoch[:-keep]:
            os.remove(p)

    def restore_meta(self, epoch: int) -> Optional[dict]:
        """Id-space sidecar of ``epoch`` (None on pre-v2 checkpoints)."""
        path = os.path.join(self.directory, f"meta_{epoch}.npz")
        if not os.path.exists(path):
            return None
        with np.load(path) as data:
            return {k: data[k] for k in data.files}

    def _npz_epoch(self) -> Optional[int]:
        path = os.path.join(self.directory, "latest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)["epoch"]

    def latest_epoch(self) -> Optional[int]:
        """Newest checkpoint across BOTH backends — a directory written
        by the npz fallback must still resume on a machine where orbax
        imports (and vice versa)."""
        cands = [self._npz_epoch()]
        if self._mgr is not None:
            cands.append(self._mgr.latest_step())
        cands = [c for c in cands if c is not None]
        return max(cands) if cands else None

    def restore_with_meta(
            self, template_state
    ) -> Tuple[Optional[object], int, Optional[dict]]:
        """``restore`` plus the id-space sidecar: returns
        (state or None, start_epoch, meta or None). Feed the meta to
        ``Recommender.load_checkpoint_meta`` so evaluation / serving /
        export are id-correct without rebuilding the DeviceData."""
        state, epoch = self.restore(template_state)
        meta = self.restore_meta(epoch) if state is not None else None
        return state, epoch, meta

    def restore(self, template_state) -> Tuple[Optional[object], int]:
        """Restore the newest checkpoint shaped like ``template_state``.

        Returns (state or None, start_epoch).
        """
        epoch = self.latest_epoch()
        if epoch is None:
            return None, 0
        tpl = _field_dict(template_state)
        in_orbax = (self._mgr is not None
                    and epoch in (self._mgr.all_steps() or []))
        if in_orbax:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=getattr(x, "sharding", None)),
                tpl)
            try:
                restored = self._mgr.restore(
                    epoch, args=self._ocp.args.StandardRestore(abstract))
            except Exception:
                # A checkpoint written before a field was added to
                # MFState must still resume: retry with only the keys
                # it has, take the rest from the template below.
                avail = set(self._mgr.item_metadata(epoch).keys())
                restored = self._mgr.restore(
                    epoch, args=self._ocp.args.StandardRestore(
                        {k: v for k, v in abstract.items() if k in avail}))
        else:
            data = np.load(
                os.path.join(self.directory, f"state_{epoch}.npz"))
            restored = {k: data[k] for k in tpl if k in data.files}
        for k in tpl:
            if k not in restored:
                _log.info("Checkpoint lacks field %r; using template", k)
                restored[k] = tpl[k]
        state = type(template_state)(**{
            k: _put_like(restored[k], tpl[k]) for k in tpl})
        return state, epoch


def _put_like(value, template) -> jax.Array:
    """Re-materialize a restored leaf with the template's sharding —
    np.load gives host arrays, and without the device_put a --mesh run
    resumed from an npz checkpoint would sit whole on one device.
    Routed through mesh.put so a large table (MSD-scale embeddings are
    ~1.1 GB) transfers in chunks (see parallel/mesh.py)."""
    from .parallel import mesh as _mesh

    sharding = getattr(template, "sharding", None)
    if not isinstance(value, jax.Array) and (
            sharding is not None or np.ndim(value) > 0):
        return _mesh.put(value, sharding)
    return jax.numpy.asarray(value)
