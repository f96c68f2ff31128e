"""Incremental SfM pipeline driver (reference src/core/sfm_pipeline.py).

Placeholder module — the full driver lands with the SfM milestone.
"""

from __future__ import annotations


class SfMPipeline:  # pragma: no cover - implemented in the SfM milestone
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("SfMPipeline lands with the SfM milestone")
