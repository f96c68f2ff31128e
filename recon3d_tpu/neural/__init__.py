"""Neural matching frontend: SuperPoint + LightGlue in Flax (reference
src/core/neural_matcher.py). Optional-import guarded like the reference
(core/__init__.py:14-18) so environments without flax still import the core."""

try:
    from recon3d_tpu.neural.matcher import NeuralMatcher
    from recon3d_tpu.neural.superpoint import neural_to_sift_features

    HAS_NEURAL = True
except ImportError:  # pragma: no cover
    NeuralMatcher = None
    neural_to_sift_features = None
    HAS_NEURAL = False

__all__ = ["NeuralMatcher", "neural_to_sift_features", "HAS_NEURAL"]
