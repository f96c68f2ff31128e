"""Host runtime: native fast paths, checkpointing, profiling, process worker."""

from recon3d_tpu.runtime.checkpoint import StageCheckpointer
from recon3d_tpu.runtime.profiling import StageTimer, maybe_trace
from recon3d_tpu.runtime.worker import ReconstructionWorker

__all__ = ["StageCheckpointer", "StageTimer", "maybe_trace", "ReconstructionWorker"]
