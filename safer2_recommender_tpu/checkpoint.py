"""Device-sharded checkpoint/resume (beyond-reference capability).

The reference has **no** serialization anywhere — embeddings live only in
RAM and a crashed run restarts from scratch (SURVEY.md section 5). We add
orbax-based checkpointing of the full MFState pytree (sharded arrays
save/restore with their shardings), with a numpy ``.npz`` fallback when
orbax is unavailable.
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

            self._ocp = ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=3),
            )
        except Exception:  # pragma: no cover - orbax is in the image
            self._ocp = None
            self._mgr = None

    def save(self, state, epoch: int) -> None:
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
        _log.info("Saved checkpoint at epoch %d", epoch)

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
            restored = self._mgr.restore(
                epoch, args=self._ocp.args.StandardRestore(abstract))
        else:
            data = np.load(
                os.path.join(self.directory, f"state_{epoch}.npz"))
            restored = {k: data[k] for k in tpl}
        state = type(template_state)(**{
            k: jax.numpy.asarray(v) for k, v in restored.items()})
        return state, epoch
