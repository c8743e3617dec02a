"""Checkpoint save/resume via orbax (reference `utils/utils.py:8-17`,
`train/main.py:330-399,484-503`).

Stores the full :class:`~laudnet_tpu.train.trainer.TrainState` (params, BN
stats, optimizer state, step) plus host metadata (epoch, metric histories,
current Gumbel temperature). ``model_best`` mirrors the reference's
``model_best.pth.tar`` copy; auto-resume picks up the latest step.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Rolling checkpoint manager over ``directory``.

    Multi-host note: ``directory`` must be SHARED storage (NFS/GCS-fuse)
    visible to every process — orbax already requires this for the array
    shards, and the JSON sidecars (``meta_<step>.json``, ``best.json``)
    are written by process 0 only, so per-host private directories would
    leave workers without metadata on restore (and the meta GC would
    never run there)."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_mgr = None  # created lazily on the first is_best save

    def _best(self):
        if self._best_mgr is None:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True
                ),
            )
        return self._best_mgr

    def save(self, step: int, state, metadata: Optional[Dict[str, Any]] = None,
             is_best: bool = False):
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
            ),
        )
        self._mgr.wait_until_finished()
        # every process must enter the orbax save (it barriers), but the
        # sidecar JSONs are plain writes: on multi-host shared storage
        # only process 0 writes them, or N concurrent 'w' opens can
        # interleave and leave invalid JSON for a later restore()
        primary = jax.process_index() == 0
        if metadata is not None and primary:
            with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
                json.dump(metadata, f)
            # GC meta sidecars whose checkpoints the rolling manager
            # deleted (all_steps() is the post-GC survivor set)
            live = set(self._mgr.all_steps())
            for name in os.listdir(self.directory):
                if name.startswith("meta_") and name.endswith(".json"):
                    s = name[len("meta_"):-len(".json")]
                    if s.isdigit() and int(s) not in live:
                        os.unlink(os.path.join(self.directory, name))
        if is_best:
            # a separate max_to_keep=1 manager, so the best weights survive
            # the rolling GC of the main manager (the model_best.pth.tar
            # copy, reference `utils/utils.py:8-17`)
            self._best().save(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardSave(state)),
            )
            self._best().wait_until_finished()
            if primary:
                with open(os.path.join(self.directory, "best.json"),
                          "w") as f:
                    json.dump({"step": step, **(metadata or {})}, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state) -> Tuple[Any, Dict[str, Any]]:
        """Restore the latest checkpoint. ``abstract_state`` is a pytree of
        ShapeDtypeStructs (e.g. ``jax.eval_shape(create_fn)``)."""
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
            ),
        )
        meta_path = os.path.join(self.directory, f"meta_{step}.json")
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        return restored["state"], metadata

    def restore_best(self, abstract_state) -> Tuple[Any, Dict[str, Any]]:
        """Restore the best-metric checkpoint saved with ``is_best=True``."""
        best = self._best()
        step = best.latest_step()
        if step is None:
            raise FileNotFoundError(f"no best checkpoint in {self.directory}")
        restored = best.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
            ),
        )
        meta_path = os.path.join(self.directory, "best.json")
        metadata = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        return restored["state"], metadata

    def close(self):
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()
