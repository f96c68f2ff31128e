"""Incremental SfM driver + bundle adjustment (reference src/core/sfm_pipeline.py)."""

from recon3d_tpu.sfm.pipeline import SfMPipeline
from recon3d_tpu.sfm.bundle import bundle_adjust

__all__ = ["SfMPipeline", "bundle_adjust"]
