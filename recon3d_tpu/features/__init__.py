"""Classical feature frontend (reference src/core/features.py)."""

from recon3d_tpu.features.frontend import FeatureExtractor, FeatureMatcher

__all__ = ["FeatureExtractor", "FeatureMatcher"]
