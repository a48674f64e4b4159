from tristage_rag_tpu.utils.profiling import StageTimer, device_host_split, trace

__all__ = ["StageTimer", "device_host_split", "trace"]
