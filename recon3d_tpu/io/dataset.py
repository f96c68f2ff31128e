"""Image-set loading with undistort-at-load semantics.

Reference parity: SfMPipeline.load_images (sfm_pipeline.py:87-124) reads a
directory of images sorted by name, resizes so the long side <= max size,
undistorts with the calibration, and rescales K accordingly. Here loading is
host-side (PIL), while resize/undistort run as one jitted device kernel per
image; all images are padded to one common static shape so every downstream
stage is shape-static (XLA requirement, SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from recon3d_tpu.camera import Camera
from recon3d_tpu.ops.image import rgb_to_gray, undistort_image

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


@dataclass
class ImageSet:
    """A loaded multi-view image set.

    gray:   (V, H, W) float32 in [0, 1] — undistorted.
    color:  (V, H, W, 3) float32 in [0, 1] — undistorted.
    camera: shared Camera with K scaled to the working resolution
            (distortion already applied to pixels; downstream treats images
            as pure pinhole, reference sfm_pipeline.py:114-124).
    names:  original file names.
    sizes:  (V, 2) actual (h, w) of each image inside the padded canvas.
    """

    gray: np.ndarray
    color: np.ndarray
    camera: Camera
    names: List[str]
    sizes: np.ndarray
    scale: float = 1.0
    # Host-side cache of working-scale color stacks keyed by scale factor,
    # filled at LOAD time (SfMPipeline prescale_hints). Rationale: on
    # single-vCPU tunneled-TPU hosts, plain numpy work measured 10-50x
    # slower for tens of seconds right after heavy device phases (observed
    # 34-60 s for a 0.33 s resize inside the dense prep); doing the resize
    # before any device phase sidesteps the whole stall.
    prescaled: Dict[float, np.ndarray] = field(default_factory=dict)

    def small_color(self, scale: float) -> np.ndarray:
        """(V, H*scale, W*scale, 3) float32 color stack, cached per scale."""
        key = round(float(scale), 6)
        if key not in self.prescaled:
            from recon3d_tpu.io.hostimg import resize_batch_np

            h = int(self.color.shape[1] * scale)
            w = int(self.color.shape[2] * scale)
            self.prescaled[key] = resize_batch_np(self.color, (h, w))
        return self.prescaled[key]


def list_images(image_dir: str) -> List[str]:
    files = sorted(
        f
        for f in os.listdir(image_dir)
        if f.lower().endswith(IMAGE_EXTS)
    )
    return files


def _round_to(v: int, m: int) -> int:
    return max(m, int(np.ceil(v / m) * m))


def focal_px_from_exif(pil_image, width_px: int):
    """Focal length in pixels from EXIF metadata, or None.

    Uses FocalLengthIn35mmFilm (tag 41989): f_px = f35 / 36mm * width.
    Checked in both the top-level IFD and the Exif sub-IFD (cameras differ).
    A practical upgrade over the no-calibration fallback the reference uses
    (sfm_pipeline.py:76-85 guesses 1.2 * max dimension for every camera).
    """
    try:
        ex = pil_image.getexif()
        f35 = ex.get(41989)
        if f35 is None:
            f35 = ex.get_ifd(0x8769).get(41989)
        if f35:
            f35 = float(f35)
            if 10.0 <= f35 <= 600.0:
                return f35 * float(width_px) / 36.0
    except Exception:
        pass
    return None


def load_image_set(
    image_dir: str,
    camera: Optional[Camera] = None,
    max_size: int = 1600,
    max_images: Optional[int] = None,
    pad_multiple: int = 16,
) -> ImageSet:
    """Load, resize, undistort a directory of images into padded arrays."""
    from PIL import Image

    files = list_images(image_dir)
    if max_images:
        files = files[:max_images]
    if not files:
        raise FileNotFoundError(f"no images in {image_dir}")

    raw: List[np.ndarray] = []
    exif_focal_px = None
    first_scale = 1.0
    for f in files:
        im = Image.open(os.path.join(image_dir, f)).convert("RGB")
        w, h = im.size
        scale = min(1.0, max_size / max(w, h))
        if not raw:
            # The resize factor actually applied to the first image, from
            # its ORIGINAL size — it rescales the provided calibration K to
            # the working resolution below (the raw arrays are already
            # resized by the time the old post-loop computation ran, which
            # made the factor silently 1.0).
            first_scale = scale
        if exif_focal_px is None:
            # read EXIF BEFORE resize (PIL's resize drops metadata), but
            # express the focal in final-width pixels
            exif_focal_px = focal_px_from_exif(
                im, int(round(w * min(scale, 1.0)))
            )
        if scale < 1.0:
            im = im.resize((int(round(w * scale)), int(round(h * scale))), Image.BILINEAR)
        raw.append(np.asarray(im, dtype=np.float32) / 255.0)

    # One padded canvas for the whole set (images in a scene share a camera,
    # so shapes are normally identical; padding covers stragglers).
    H = _round_to(max(r.shape[0] for r in raw), pad_multiple)
    W = _round_to(max(r.shape[1] for r in raw), pad_multiple)

    color = np.zeros((len(raw), H, W, 3), np.float32)
    sizes = np.zeros((len(raw), 2), np.int32)
    for i, r in enumerate(raw):
        color[i, : r.shape[0], : r.shape[1]] = r
        sizes[i] = (r.shape[0], r.shape[1])

    # Scale K by the applied resize factor (reference sfm_pipeline.py:116-124).
    if camera is None:
        # Intrinsics fallback chain: EXIF 35mm-equivalent focal when the
        # images carry it, else f = 1.2 * max dim at the principal point
        # (the reference's only option, sfm_pipeline.py:76-85).
        f = exif_focal_px or 1.2 * max(H, W)
        if exif_focal_px:
            print(f"[load] EXIF focal: {f:.1f} px")
        camera = Camera.create(fx=f, fy=f, cx=W / 2.0, cy=H / 2.0)
    elif first_scale < 1.0:
        camera = camera.scaled(first_scale)

    has_dist = bool(np.any(np.abs(np.asarray(camera.dist)) > 1e-12))
    if has_dist:
        # Undistortion is a device warp; ship uint8 both ways (4x fewer
        # bytes than float32 — the link, not compute, bounds loading).
        u8 = np.clip(color * 255.0, 0.0, 255.0).astype(np.uint8)
        undist = jax.jit(
            jax.vmap(
                lambda im: jnp.clip(
                    undistort_image(
                        im.astype(jnp.float32) / 255.0, camera.K, camera.dist
                    )
                    * 255.0,
                    0.0,
                    255.0,
                ).astype(jnp.uint8)
            )
        )
        color = np.asarray(undist(jnp.asarray(u8))).astype(np.float32) / 255.0
        camera = Camera(K=camera.K, dist=jnp.zeros_like(camera.dist))

    # Gray on the host: shipping full-res float32 RGB through the device
    # just for a dot product costs seconds/frame over the link.
    from recon3d_tpu.io.hostimg import rgb_to_gray_np

    return ImageSet(
        gray=rgb_to_gray_np(color),
        color=color,
        camera=camera,
        names=files,
        sizes=sizes,
        scale=first_scale,
    )


def image_set_from_arrays(
    images: np.ndarray, camera: Camera, names: Optional[List[str]] = None
) -> ImageSet:
    """Wrap pre-loaded (V, H, W, 3) float arrays (synthetic scenes, tests)."""
    from recon3d_tpu.io.hostimg import rgb_to_gray_np

    images = np.asarray(images, np.float32)
    V, H, W = images.shape[:3]
    gray = rgb_to_gray_np(images)
    return ImageSet(
        gray=gray,
        color=images,
        camera=camera,
        names=names or [f"synthetic_{i:04d}" for i in range(V)],
        sizes=np.tile([H, W], (V, 1)).astype(np.int32),
    )
