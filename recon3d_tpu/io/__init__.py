from recon3d_tpu.io.ply import load_ply, save_ply, save_cameras_ply, compute_scene_bounds

__all__ = ["load_ply", "save_ply", "save_cameras_ply", "compute_scene_bounds"]
