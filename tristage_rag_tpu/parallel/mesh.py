"""Device mesh helpers.

The engine uses one 1-D mesh axis ("data") for both of its parallelism
forms (SURVEY.md §2.6): document-axis sharding of the dense index
(per-shard scan + all-gather top-k merge over ICI) and data-parallel
batch sharding of encoder forwards (weights replicated — the encoders
are 20–300M params and fit per-core). Multi-slice/DCN is a mesh-shape
change, by design.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def create_mesh(n_devices: int = 0, axis: str = DATA_AXIS) -> Optional[Mesh]:
    """1-D mesh over local devices; None when a single device suffices.

    n_devices: 0 = all local devices; 1 = force single-device (no mesh).
    """
    devices = jax.devices()
    if n_devices == 0:
        n_devices = len(devices)
    if n_devices <= 1:
        return None
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def mesh_info(mesh: Optional[Mesh]) -> dict:
    if mesh is None:
        d = jax.devices()[0]
        return {"devices": 1, "platform": d.platform, "mesh": None}
    return {
        "devices": mesh.size,
        "platform": mesh.devices.flat[0].platform,
        "mesh": dict(mesh.shape),
    }
