from recon3d_tpu.io.ply import load_ply, save_ply, save_cameras_ply, compute_scene_bounds
from recon3d_tpu.io.colmap import (
    ColmapModel,
    load_colmap_text,
    save_colmap_text,
)

__all__ = [
    "load_ply",
    "save_ply",
    "save_cameras_ply",
    "compute_scene_bounds",
    "ColmapModel",
    "load_colmap_text",
    "save_colmap_text",
]
