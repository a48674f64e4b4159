"""Training checkpoint/resume via Orbax.

The reference has index persistence only (SURVEY.md §5.4); training is
new capability in the TPU build, so its state (params, optimizer state,
step) gets first-class checkpointing: Orbax CheckpointManager with
retention rotation, atomic writes, and mesh-aware restore (params land
back on their shardings when a mesh is supplied).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)


class TrainCheckpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: dict[str, Any]) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        logger.info("saved training checkpoint at step %d", step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: dict[str, Any], step: Optional[int] = None
    ) -> dict[str, Any]:
        """Restore into the structure/shardings of ``abstract_state``.

        ``abstract_state`` is a pytree of arrays (e.g. a freshly-inited
        train state) used as the restore template.
        """
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape")
            else x,
            abstract_state,
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        # Re-place every leaf on its template sharding: Orbax may
        # restore scalars/arrays with default placements, which then
        # conflict inside a sharded jitted train step.
        restored = jax.tree.map(
            lambda t, r: jax.device_put(r, t.sharding)
            if hasattr(t, "sharding")
            else r,
            abstract_state,
            restored,
        )
        logger.info("restored training checkpoint from step %d", step)
        return restored

    def close(self) -> None:
        self._mgr.close()
