from tristage_rag_tpu.parallel.mesh import DATA_AXIS, create_mesh, mesh_info

__all__ = ["DATA_AXIS", "create_mesh", "mesh_info"]
