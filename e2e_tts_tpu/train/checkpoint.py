"""Checkpoint save/restore/scan (orbax).

Same logical behavior as the reference's torch checkpoints
(tools_for_model.py:155-185: numbered files, ``scan_checkpoint`` latest-pick,
resume with optimizer state) on orbax's async, pytree-native storage.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return template
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_sharded(
        self, template: Any, shardings: Any, step: Optional[int] = None
    ) -> Any:
        """Restore directly onto a device mesh: ``shardings`` is a pytree
        of jax.sharding.Sharding with the SAME structure as ``template``
        (build one with jax.tree.map, e.g. param_sharding_rules — a prefix
        tree is NOT accepted: tree_map flattens both).  Arrays
        come back already placed — no host gather + re-placement round trip,
        which matters once params outgrow one host (ROADMAP: checkpoint
        sharding for larger variants)."""
        import jax

        step = step if step is not None else self.latest_step()
        if step is None:
            return template

        def to_struct(x, s):
            x = jax.numpy.asarray(x) if not hasattr(x, "shape") else x
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

        structs = jax.tree_util.tree_map(to_struct, template, shardings)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(structs))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def scan_checkpoint(directory: str) -> Optional[int]:
    """Latest checkpoint step in a directory (reference scan_checkpoint,
    tools_for_model.py:180-185)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.isdigit():
            steps.append(int(name))
    return max(steps) if steps else None
