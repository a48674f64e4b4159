from tristage_rag_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    create_hybrid_mesh,
    create_mesh,
    dcn_groups,
    mesh_info,
)

__all__ = [
    "DATA_AXIS",
    "DCN_AXIS",
    "create_hybrid_mesh",
    "create_mesh",
    "dcn_groups",
    "mesh_info",
]
