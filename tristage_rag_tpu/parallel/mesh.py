"""Device mesh helpers.

The engine uses one 1-D mesh axis ("data") for both of its parallelism
forms (SURVEY.md §2.6): document-axis sharding of the dense index
(per-shard scan + all-gather top-k merge over ICI) and data-parallel
batch sharding of encoder forwards (weights replicated — the encoders
are 20–300M params and fit per-core).

Multi-slice/DCN (SURVEY.md §5.8) is the 2-D variant built by
``create_hybrid_mesh``: an outer "dcn" axis over slices and the inner
"data" axis within a slice. The layout rule is the scaling-book one —
every collective the engine issues (all-gather top-k merge, stage-2
score psum, stage-3 pair-row psum / logit all-gather) names ONLY the
"data" axis, so collectives ride ICI; the "dcn" axis carries nothing
but batch parallelism (queries in serving, gradient psum in training),
which is the only traffic slow DCN links can afford.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
DCN_AXIS = "dcn"


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


def create_hybrid_mesh(
    dcn: int,
    data: int = 0,
    dcn_axis: str = DCN_AXIS,
    data_axis: str = DATA_AXIS,
) -> Optional[Mesh]:
    """2-D ("dcn", "data") mesh for multi-slice deployments.

    ``dcn`` = number of slices (or pseudo-slices when the runtime
    exposes no slice structure — e.g. the virtual CPU mesh used in
    tests); ``data`` = devices per slice (0 = infer from what's
    available). ``dcn <= 1`` degrades to the 1-D ``create_mesh``.

    On real multi-slice TPU the grouping follows each device's
    ``slice_index`` so the inner axis is genuinely ICI-connected;
    anywhere else local devices are partitioned row-major into ``dcn``
    equal groups (semantics identical, interconnect distinction moot).
    """
    if dcn <= 1:
        return create_mesh(data, axis=data_axis)
    devices = jax.devices()

    # Group by the runtime's slice structure when it exists and fits.
    slices: dict[int, list] = {}
    for d in devices:
        slices.setdefault(getattr(d, "slice_index", None) or 0, []).append(d)
    sizes = {len(v) for v in slices.values()}
    if len(slices) >= dcn and len(sizes) == 1:
        per_slice = sizes.pop()
        if data == 0:
            data = per_slice
        if data <= per_slice:
            keys = sorted(slices)[:dcn]
            arr = np.asarray([slices[k][:data] for k in keys])
            return Mesh(arr, (dcn_axis, data_axis))

    # Single-slice / CPU: partition local devices into pseudo-slices.
    if data == 0:
        if len(devices) % dcn:
            raise ValueError(
                f"{len(devices)} devices do not split into {dcn} equal "
                f"dcn groups; pass data= explicitly"
            )
        data = len(devices) // dcn
    need = dcn * data
    if need > len(devices):
        raise ValueError(
            f"requested dcn={dcn} x data={data} = {need} devices, only "
            f"{len(devices)} available"
        )
    arr = np.asarray(devices[:need]).reshape(dcn, data)
    return Mesh(arr, (dcn_axis, data_axis))


def dcn_groups(mesh: Optional[Mesh], dcn_axis: str = DCN_AXIS) -> int:
    """Size of the mesh's dcn axis (1 when absent / no mesh)."""
    if mesh is None or dcn_axis not in mesh.axis_names:
        return 1
    return mesh.shape[dcn_axis]


def mesh_info(mesh: Optional[Mesh]) -> dict:
    if mesh is None:
        d = jax.devices()[0]
        return {"devices": 1, "platform": d.platform, "mesh": None}
    return {
        "devices": mesh.size,
        "platform": mesh.devices.flat[0].platform,
        "mesh": dict(mesh.shape),
    }
