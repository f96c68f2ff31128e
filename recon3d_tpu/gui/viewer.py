"""Point-cloud viewing: headless turntable renderer + optional Qt viewer.

Capability parity with reference src/gui/viewer.py (ViewerTab :163-383 and
its PLY loader :32-160 — the loader lives in recon3d_tpu.io.ply here):
density subsampling for very large clouds, adjustable point size, orbit
views. The render itself is a vectorized z-buffered point splatter (numpy)
so it works with no display server; `ViewerTab` wraps it in Qt when PyQt5
is importable (it is optional, exactly like the reference's pyqtgraph guard
viewer.py:19-29).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from recon3d_tpu.io.ply import load_ply

MAX_DISPLAY_POINTS = 1_000_000  # reference viewer.py:320-352


def subsample_for_display(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    max_points: int = MAX_DISPLAY_POINTS,
    seed: int = 0,
):
    """Random subsample when the cloud exceeds the display budget
    (reference viewer.py:320-352)."""
    n = len(points)
    if n <= max_points:
        return points, colors
    idx = np.random.default_rng(seed).choice(n, max_points, replace=False)
    return points[idx], (colors[idx] if colors is not None else None)


def render_pointcloud(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    image_size: Tuple[int, int] = (600, 800),
    azimuth_deg: float = 30.0,
    elevation_deg: float = 20.0,
    point_size: int = 1,
    background: float = 0.08,
) -> np.ndarray:
    """Software z-buffer splat of a point cloud from an orbit camera.

    Returns (H, W, 3) uint8. The orbit camera looks at the cloud median from
    a distance framing the 90th-percentile radius.
    """
    H, W = image_size
    img = np.full((H, W, 3), background, np.float32)
    if len(points) == 0:
        return (img * 255).astype(np.uint8)
    if colors is None:
        colors = np.full((len(points), 3), 200, np.uint8)

    center = np.median(points, axis=0)
    radius = np.percentile(np.linalg.norm(points - center, axis=1), 90) + 1e-6

    az = np.radians(azimuth_deg)
    el = np.radians(elevation_deg)
    # camera center on the orbit sphere
    C = center + 2.8 * radius * np.array(
        [np.cos(el) * np.sin(az), -np.sin(el), -np.cos(el) * np.cos(az)]
    )
    z = center - C
    z = z / np.linalg.norm(z)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x) + 1e-12
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    f = 1.1 * max(H, W)

    Xc = (points - C) @ R.T
    zc = Xc[:, 2]
    front = zc > 1e-3
    u = (f * Xc[front, 0] / zc[front] + W / 2).astype(np.int32)
    v = (f * Xc[front, 1] / zc[front] + H / 2).astype(np.int32)
    zf = zc[front]
    cf = colors[front].astype(np.float32) / 255.0

    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, zf, cf = u[inb], v[inb], zf[inb], cf[inb]
    # z-buffer: sort far-to-near, later writes win
    order = np.argsort(-zf)
    u, v, cf = u[order], v[order], cf[order]
    r = max(0, point_size - 1)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            vv = np.clip(v + dy, 0, H - 1)
            uu = np.clip(u + dx, 0, W - 1)
            img[vv, uu] = cf
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def mesh_to_shaded_points(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    azimuth_deg: float = 30.0,
    elevation_deg: float = 20.0,
    samples: int = 600_000,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Flat-shade a triangle mesh into a dense point set the z-buffer
    splatter can draw: area-proportional barycentric surface samples,
    Lambert-lit by a headlight at the orbit camera. Keeps the viewer
    renderer single-path (points) while mesh.ply previews read as solid
    shaded surfaces instead of bare vertices."""
    if len(faces) == 0:
        return verts, (
            colors if colors is not None
            else np.full((len(verts), 3), 200, np.uint8)
        )
    rng = np.random.default_rng(seed)
    tri = verts[faces]  # (F, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(nrm, axis=1)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    probs = area / max(area.sum(), 1e-12)
    pick = rng.choice(len(faces), size=samples, p=probs)
    r1 = np.sqrt(rng.random(samples))
    r2 = rng.random(samples)
    a = 1 - r1
    b = r1 * (1 - r2)
    c = r1 * r2
    pts = (
        tri[pick, 0] * a[:, None]
        + tri[pick, 1] * b[:, None]
        + tri[pick, 2] * c[:, None]
    ).astype(np.float32)

    # headlight at the orbit camera (same orbit math as render_pointcloud)
    az, el = np.radians(azimuth_deg), np.radians(elevation_deg)
    view = -np.array(
        [np.cos(el) * np.sin(az), -np.sin(el), -np.cos(el) * np.cos(az)]
    )
    lambert = 0.25 + 0.75 * np.abs(nrm[pick] @ view)
    if colors is not None:
        base = (
            colors[faces[pick, 0]].astype(np.float32)
            + colors[faces[pick, 1]]
            + colors[faces[pick, 2]]
        ) / 3.0
    else:
        base = np.full((samples, 3), 200.0, np.float32)
    shaded = np.clip(base * lambert[:, None], 0, 255).astype(np.uint8)
    return pts, shaded


def is_mesh_ply(path: str) -> bool:
    """True when the PLY header declares a non-empty face element."""
    try:
        with open(path, "rb") as f:
            for _ in range(64):
                line = f.readline()
                if not line or line.strip() == b"end_header":
                    break
                t = line.split()
                if len(t) >= 3 and t[0] == b"element" and t[1] == b"face":
                    return int(t[2]) > 0
    except OSError:
        pass
    return False


def orbit_drag(
    azimuth_deg: float,
    elevation_deg: float,
    dx_px: float,
    dy_px: float,
    deg_per_px: float = 0.4,
) -> Tuple[float, float]:
    """New (azimuth, elevation) after a mouse drag of (dx, dy) pixels.

    Horizontal drag orbits around the scene, vertical drag tilts; elevation
    clamps short of the poles so the orbit camera's up-vector never
    degenerates. This is the math behind ViewerTab's drag-to-orbit (the
    reference gets it for free from pyqtgraph's GLViewWidget,
    viewer.py:364-371).
    """
    az = (azimuth_deg + dx_px * deg_per_px) % 360.0
    el = float(np.clip(elevation_deg + dy_px * deg_per_px, -89.0, 89.0))
    return az, el


def render_turntable(
    ply_path: str,
    out_prefix: str,
    n_frames: int = 8,
    image_size: Tuple[int, int] = (600, 800),
    point_size: int = 1,
    max_points: int = MAX_DISPLAY_POINTS,
):
    """Render a PLY from n_frames orbit azimuths to PNG files.

    The headless stand-in for the interactive GL view (reference
    viewer.py:364-371). Returns the written paths.
    """
    from PIL import Image

    mesh = None
    if is_mesh_ply(ply_path):
        from recon3d_tpu.io.ply import load_mesh_ply

        mesh = load_mesh_ply(ply_path)
    else:
        points, colors = load_ply(ply_path)
        points, colors = subsample_for_display(points, colors, max_points)
    paths = []
    for i in range(n_frames):
        az = 360.0 * i / n_frames
        if mesh is not None:
            points, colors = mesh_to_shaded_points(
                mesh[0], mesh[1], mesh[2], azimuth_deg=az,
                samples=min(max_points, 600_000),
            )
        img = render_pointcloud(
            points, colors, image_size,
            azimuth_deg=az,
            point_size=point_size,
        )
        p = f"{out_prefix}_{i:02d}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


try:  # optional Qt viewer, like the reference's pyqtgraph guard
    from PyQt5 import QtWidgets  # type: ignore

    HAS_QT = True
except Exception:  # pragma: no cover - Qt not installed in CI
    HAS_QT = False

if HAS_QT:  # pragma: no cover - exercised only with a display

    class ViewerTab(QtWidgets.QWidget):
        """Interactive viewer: file browser + density/point-size sliders
        rendering through render_pointcloud into a QLabel, with
        drag-to-orbit on the canvas (reference ViewerTab viewer.py:163-383
        — its GL view's mouse orbit maps to azimuth/elevation here)."""

        ORBIT_DEG_PER_PX = 0.4  # drag sensitivity

        def __init__(self, parent=None):
            super().__init__(parent)
            self.points = np.zeros((0, 3), np.float32)
            self.colors = None
            self.azimuth = 30.0
            self.elevation = 20.0
            self._drag_from = None
            layout = QtWidgets.QVBoxLayout(self)
            row = QtWidgets.QHBoxLayout()
            self.open_btn = QtWidgets.QPushButton("Open PLY...")
            self.open_btn.clicked.connect(self._open)
            row.addWidget(self.open_btn)
            self.density = QtWidgets.QSlider()
            self.density.setRange(1, 100)
            self.density.setValue(100)
            self.density.valueChanged.connect(self._redraw)
            row.addWidget(self.density)
            self.psize = QtWidgets.QSlider()
            self.psize.setRange(1, 5)
            self.psize.valueChanged.connect(self._redraw)
            row.addWidget(self.psize)
            layout.addLayout(row)
            self.canvas = QtWidgets.QLabel()
            layout.addWidget(self.canvas)

        def load_ply_file(self, path: str):
            self.mesh = None
            if is_mesh_ply(path):
                from recon3d_tpu.io.ply import load_mesh_ply

                self.mesh = load_mesh_ply(path)
                self.points = self.mesh[0]
                self.colors = self.mesh[2]
            else:
                self.points, self.colors = load_ply(path)
            self._redraw()

        def mousePressEvent(self, ev):
            self._drag_from = (ev.x(), ev.y())

        def mouseMoveEvent(self, ev):
            if self._drag_from is None:
                return
            x0, y0 = self._drag_from
            self.azimuth, self.elevation = orbit_drag(
                self.azimuth, self.elevation,
                ev.x() - x0, ev.y() - y0, self.ORBIT_DEG_PER_PX,
            )
            self._drag_from = (ev.x(), ev.y())
            self._redraw()

        def mouseReleaseEvent(self, ev):
            self._drag_from = None

        def _open(self):
            path, _ = QtWidgets.QFileDialog.getOpenFileName(
                self, "Open PLY", "", "PLY files (*.ply)"
            )
            if path:
                self.load_ply_file(path)

        def _redraw(self):
            from PyQt5 import QtGui

            frac = self.density.value() / 100.0
            if getattr(self, "mesh", None) is not None:
                pts, cols = mesh_to_shaded_points(
                    self.mesh[0], self.mesh[1], self.mesh[2],
                    azimuth_deg=self.azimuth, elevation_deg=self.elevation,
                    samples=max(1000, int(200_000 * frac)),
                )
            else:
                pts, cols = subsample_for_display(
                    self.points, self.colors,
                    max_points=max(1, int(len(self.points) * frac)),
                )
            img = render_pointcloud(
                pts, cols, point_size=self.psize.value(),
                azimuth_deg=self.azimuth, elevation_deg=self.elevation,
            )
            h, w = img.shape[:2]
            qimg = QtGui.QImage(
                img.tobytes(), w, h, 3 * w, QtGui.QImage.Format_RGB888
            )
            self.canvas.setPixmap(QtGui.QPixmap.fromImage(qimg))
