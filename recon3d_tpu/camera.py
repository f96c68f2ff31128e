"""Camera intrinsics and extrinsics as JAX pytrees.

Capability parity with reference src/core/camera.py (Camera :10-75,
CameraPose :78-108, load_calibration :111-138), re-designed as immutable
flax.struct dataclasses so cameras/poses batch naturally under vmap/scan and
shard over device meshes.

Conventions (same as the reference):
  - K is the 3x3 intrinsic matrix; images are undistorted at load time, so
    `project` applies the pinhole model only (reference camera.py:41-58).
  - CameraPose (R, t) maps world -> camera:  x_cam = R @ x_world + t.
  - camera center C = -R^T t  (reference camera.py:92-95).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
from flax import struct


@struct.dataclass
class Camera:
    """Pinhole camera intrinsics (+ stored distortion for undistort-at-load).

    Attributes:
      K:    (..., 3, 3) intrinsic matrix.
      dist: (..., 5) OpenCV-convention distortion [k1, k2, p1, p2, k3].
    """

    K: jnp.ndarray
    dist: jnp.ndarray

    @classmethod
    def create(cls, fx, fy, cx, cy, skew=0.0, dist=None) -> "Camera":
        K = jnp.array(
            [[fx, skew, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=jnp.float32
        )
        if dist is None:
            dist = jnp.zeros(5, dtype=jnp.float32)
        else:
            dist = jnp.asarray(dist, dtype=jnp.float32)
        return cls(K=K, dist=dist)

    @classmethod
    def from_matrix(cls, K, dist=None) -> "Camera":
        K = jnp.asarray(K, dtype=jnp.float32)
        if dist is None:
            dist = jnp.zeros(K.shape[:-2] + (5,), dtype=jnp.float32)
        else:
            dist = jnp.asarray(dist, dtype=jnp.float32)
        return cls(K=K, dist=dist)

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    @property
    def cx(self):
        return self.K[..., 0, 2]

    @property
    def cy(self):
        return self.K[..., 1, 2]

    def scaled(self, scale: float) -> "Camera":
        """Intrinsics for an image resized by `scale` (used by dense backends)."""
        S = jnp.array(
            [[scale, 0.0, 0.0], [0.0, scale, 0.0], [0.0, 0.0, 1.0]],
            dtype=self.K.dtype,
        )
        return Camera(K=jnp.matmul(S, self.K, precision=_HI), dist=self.dist)

    def project(self, points_cam: jnp.ndarray) -> jnp.ndarray:
        """Project camera-frame 3D points to pixels (pinhole, no distortion).

        points_cam: (..., 3) -> (..., 2). Matches reference camera.py:41-58:
        z is clamped away from 0 to avoid NaNs; callers gate on z > 0.
        """
        z = points_cam[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
        xy = points_cam[..., :2] / z
        u = self.fx * xy[..., 0] + self.K[..., 0, 1] * xy[..., 1] + self.cx
        v = self.fy * xy[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, pixels: jnp.ndarray, depth=1.0) -> jnp.ndarray:
        """Back-project pixels to camera-frame rays scaled by depth.

        pixels: (..., 2), depth scalar or (...,) -> (..., 3).
        Matches reference camera.py:60-75.
        """
        depth = jnp.asarray(depth, dtype=pixels.dtype)
        x = (pixels[..., 0] - self.cx) / self.fx
        y = (pixels[..., 1] - self.cy) / self.fy
        d = jnp.broadcast_to(depth, x.shape)
        return jnp.stack([x * d, y * d, d], axis=-1)

    def normalized(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """Pixel -> normalized image coordinates (z=1 plane)."""
        return self.unproject(pixels, 1.0)[..., :2]


@struct.dataclass
class CameraPose:
    """World -> camera rigid transform. R: (..., 3, 3), t: (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def identity(cls, batch_shape=()) -> "CameraPose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=jnp.float32)
        return cls(R=R, t=t)

    @property
    def center(self) -> jnp.ndarray:
        """Camera center in world frame: C = -R^T t (reference camera.py:92-95)."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t, precision=_HI)

    @property
    def projection_matrix(self) -> jnp.ndarray:
        """[R | t], (..., 3, 4) (reference camera.py:97-99)."""
        return jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)

    def transform_points(self, points_world: jnp.ndarray) -> jnp.ndarray:
        """(..., N, 3) world -> camera frame (reference camera.py:101-103)."""
        return (
            jnp.einsum("...ij,...nj->...ni", self.R, points_world, precision=_HI)
            + self.t[..., None, :]
        )

    def inverse(self) -> "CameraPose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return CameraPose(R=Rt, t=-jnp.einsum("...ij,...j->...i", Rt, self.t, precision=_HI))

    def compose(self, other: "CameraPose") -> "CameraPose":
        """self ∘ other: apply `other` first, then `self`."""
        return CameraPose(
            R=jnp.matmul(self.R, other.R, precision=_HI),
            t=jnp.einsum("...ij,...j->...i", self.R, other.t, precision=_HI) + self.t,
        )

    def look_at(self) -> jnp.ndarray:
        """Unit forward (+z of camera) direction in world frame."""
        return self.R[..., 2, :]


def stack_poses(poses) -> CameraPose:
    """Stack a list of CameraPose into one batched CameraPose."""
    return CameraPose(
        R=jnp.stack([p.R for p in poses]), t=jnp.stack([p.t for p in poses])
    )


def projection_from_KRt(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t], (..., 3, 4)."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.matmul(K, Rt, precision=_HI)


def load_calibration(path: str) -> Camera:
    """Load a .npz calibration file (keys mtx, dist) into a Camera.

    Same file format as the reference (camera.py:111-138, produced by
    calibration.py:150). Host-side numpy; returns a device Camera.
    """
    data = np.load(path)
    K = np.asarray(data["mtx"], dtype=np.float32)
    dist = np.asarray(data["dist"], dtype=np.float32).reshape(-1)
    if dist.size < 5:
        dist = np.pad(dist, (0, 5 - dist.size))
    return Camera(K=jnp.asarray(K), dist=jnp.asarray(dist[:5]))
