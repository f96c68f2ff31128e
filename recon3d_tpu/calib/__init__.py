"""Camera calibration: chessboard detection, Zhang+LM solve, validation
(replaces reference src/calibration/, SURVEY.md §2 components 16-17)."""

from recon3d_tpu.calib.calibrate import (
    board_points,
    calibrate_camera_robust,
    calibrate_from_corners,
    save_calibration,
)
from recon3d_tpu.calib.corners import detect_corners, find_chessboard
from recon3d_tpu.calib.validate import validate_calibration

__all__ = [
    "board_points",
    "calibrate_camera_robust",
    "calibrate_from_corners",
    "save_calibration",
    "detect_corners",
    "find_chessboard",
    "validate_calibration",
]
