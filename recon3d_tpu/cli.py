"""Command-line entry point: images -> sparse + dense PLY point clouds.

Flag surface parity with reference src/run_reconstruction.py:24-44
(`--neural --mvs --stereo --dense --combined --fast --max-images --output`),
plus framework-native extras (--calibration, --checkpoint-dir, --seed,
--profile). The dataset argument accepts either a path to an image directory
or a bare name resolved under data/samples/ like the reference (:47-50).

Run as `python -m recon3d_tpu.cli <image_dir_or_dataset> [flags]`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="recon3d_tpu",
        description="TPU-native 3D reconstruction from images",
    )
    p.add_argument(
        "dataset",
        help="Image directory, or dataset name under data/samples/",
    )
    p.add_argument("--max-images", type=int, default=None,
                   help="Maximum number of images to process")
    p.add_argument("--dense", action="store_true",
                   help="Dense SIFT triangulation backend")
    p.add_argument("--stereo", action="store_true",
                   help="Plane-sweep stereo backend")
    p.add_argument("--mvs", action="store_true",
                   help="PatchMatch MVS backend (best quality)")
    p.add_argument("--combined", action="store_true",
                   help="Combined stereo + dense (deprecated; runs both)")
    p.add_argument("--fast", action="store_true",
                   help="Fast mode: sparse only, reduced resolution")
    p.add_argument("--neural", action="store_true",
                   help="SuperPoint + LightGlue neural matcher")
    p.add_argument("--output", type=str, default=None,
                   help="Output directory (default: <dataset>/reconstruction)")
    p.add_argument("--calibration", type=str, default=None,
                   help=".npz calibration file (keys mtx, dist)")
    p.add_argument("--checkpoint-dir", type=str, default=None,
                   help="Stage checkpoint directory (resume after crash)")
    p.add_argument("--seed", type=int, default=0, help="PRNG seed")
    p.add_argument("--profile", type=str, default=None,
                   help="Write a jax.profiler trace to this directory")
    p.add_argument("--stats-json", type=str, default=None,
                   help="Write pipeline statistics + stage timings to a JSON file")
    p.add_argument("--devices", type=int, default=0,
                   help="Max devices to use (0 = all; 1 disables the mesh)")
    p.add_argument("--global-sfm", action="store_true",
                   help="Global SfM (rotation/translation averaging over "
                        "the whole pose graph) instead of incremental "
                        "registration")
    p.add_argument("--mesh", action="store_true",
                   help="Also extract a TSDF triangle mesh (mesh.ply) from "
                        "the PatchMatch depth maps (implies --mvs)")
    p.add_argument("--mesh-resolution", type=int, default=192,
                   help="TSDF voxels per axis for --mesh")
    p.add_argument("--export-colmap", action="store_true",
                   help="Also write the sparse model as a COLMAP text model "
                        "(<output>/sparse_colmap/)")
    p.add_argument("--from-colmap", type=str, default=None, metavar="MODEL_DIR",
                   help="Skip SfM: take poses + sparse points from an "
                        "existing COLMAP text model and run the requested "
                        "dense stages on its images")
    return p


def resolve_dataset(dataset: str) -> Path:
    d = Path(dataset)
    if d.is_dir():
        return d
    candidate = Path("data/samples") / dataset
    if candidate.is_dir():
        return candidate
    raise SystemExit(f"ERROR: image directory not found: {dataset}")


def load_from_colmap(pipeline, model_dir: str, image_dir: str,
                     max_images=None):
    """Seed the pipeline from an existing COLMAP text model: load the images,
    map model entries to them by file name, and adopt the model's poses,
    intrinsics (rescaled to the working resolution), and sparse points. The
    TPU dense stages then run on a reconstruction COLMAP produced — interop
    the reference cannot do in either direction."""
    import os as _os

    import jax.numpy as jnp

    from recon3d_tpu.camera import Camera
    from recon3d_tpu.io.colmap import load_colmap_text

    model = load_colmap_text(model_dir)
    # Adopt the model's intrinsics (original resolution) BEFORE loading:
    # load_images then rescales K to the working resolution and undistorts
    # the pixels exactly as it does for a calibrated run, so OPENCV /
    # SIMPLE_RADIAL models work, not just PINHOLE.
    if model.images:
        first_im = model.images[min(model.images)]
        cam = model.cameras[first_im.camera_id]
    else:
        cam = model.cameras[min(model.cameras)]
    if len(model.cameras) > 1:
        # The pipeline shares ONE camera across all views (like the
        # reference); COLMAP's default ImageReader makes one per image.
        print(
            f"WARNING: COLMAP model has {len(model.cameras)} cameras; "
            f"adopting camera {cam.camera_id} ({cam.model}) for ALL "
            f"images — views calibrated differently will reproject wrongly"
        )
    pipeline.camera = Camera(
        K=jnp.asarray(cam.K()), dist=jnp.asarray(cam.dist())
    )
    iset = pipeline.load_images(image_dir, max_images)
    name_to_idx = {n: i for i, n in enumerate(iset.names)}

    poses = {}
    for im in model.images.values():
        idx = name_to_idx.get(im.name)
        if idx is None:
            idx = name_to_idx.get(_os.path.basename(im.name))
        if idx is None:
            continue
        poses[idx] = (im.R().astype(np.float32), im.t.astype(np.float32))
    if not poses:
        raise SystemExit(
            f"ERROR: no image names in {model_dir}/images.txt match files "
            f"in {image_dir}"
        )
    pipeline.poses = dict(poses)
    pipeline.registered = set(poses.keys())
    pipeline.points3d = model.points.astype(np.float32)
    pipeline.point_colors = model.colors

    points = model.points.astype(np.float32).reshape(-1, 3)
    colors = model.colors.reshape(-1, 3)
    return points, colors, poses


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # Start device-link establishment NOW, on a daemon thread: the first
    # device->host fetch of a process can stall for minutes on tunneled
    # runtimes, and this overlaps it with image loading + tracing instead
    # of letting it land inside a pipeline stage (runtime/warmup.py).
    from recon3d_tpu.runtime.warmup import warm_device_async

    warm_device_async()

    image_dir = resolve_dataset(args.dataset)
    output_dir = Path(args.output) if args.output else image_dir / "reconstruction"
    output_dir.mkdir(parents=True, exist_ok=True)

    import dataclasses

    from recon3d_tpu.config import ReconstructionConfig
    from recon3d_tpu.io.ply import save_ply, save_cameras_ply
    from recon3d_tpu.sfm.pipeline import SfMPipeline
    from recon3d_tpu.runtime.profiling import StageTimer, maybe_trace

    mode = [
        m for f, m in [
            (args.neural, "Neural matching"),
            (args.mvs, "PatchMatch MVS"),
            (args.stereo, "Plane-sweep stereo"),
            (args.dense, "Dense SIFT"),
            (args.combined, "Combined"),
            (args.fast, "Fast/sparse"),
        ] if f
    ] or ["Sparse"]
    print(f"recon3d_tpu: {image_dir} -> {output_dir}  [{' + '.join(mode)}]")

    cfg = ReconstructionConfig.fast() if args.fast else ReconstructionConfig()
    cfg = cfg.replace(sfm=dataclasses.replace(cfg.sfm, seed=args.seed))
    timer = StageTimer()

    # Multi-chip hosts get a data-parallel mesh automatically: pair matching
    # and the dense per-view jobs shard over it (the reference runs these as
    # serial single-GPU loops, mvs_patchmatch.py:104-123 /
    # sfm_pipeline.py:188-208). --devices 1 forces the single-device path.
    mesh = None
    if args.devices != 1:
        import jax

        from recon3d_tpu.parallel.mesh import make_mesh
        from recon3d_tpu.config import MeshConfig

        devs = jax.devices()
        if args.devices > 0:
            devs = devs[: args.devices]
        if len(devs) > 1:
            mesh = make_mesh(MeshConfig(model_parallel=1), devices=devs)
            print(f"[mesh] data-parallel over {mesh.shape['data']} devices")

    # Dense-stage working scales, prescaled at image-LOAD time (before any
    # heavy device phase): host numpy measured 10-50x slower for tens of
    # seconds right after device work on single-vCPU tunneled hosts, which
    # turned the dense backends' 0.3 s image prep into 34-60 s.
    will_mvs = args.mvs or (args.mesh and not (args.stereo and not args.mvs))
    will_stereo = args.stereo or args.combined
    prescales = set()
    if will_mvs and not args.fast:
        prescales.add(cfg.patchmatch.scale)
    if will_stereo and not args.fast:
        prescales.add(cfg.plane_sweep.scale)

    with maybe_trace(args.profile):
        pipeline = SfMPipeline(
            calibration_path=args.calibration,
            fast_mode=args.fast,
            neural_mode=args.neural,
            config=cfg,
            mesh=mesh,
            prescale_hints=tuple(sorted(prescales)),
        )

        ckpt = None
        if args.checkpoint_dir:
            from recon3d_tpu.runtime.checkpoint import StageCheckpointer

            ckpt = StageCheckpointer(args.checkpoint_dir)

        if args.from_colmap:
            with timer.stage("sparse_sfm"):
                points, colors, poses = load_from_colmap(
                    pipeline, args.from_colmap, str(image_dir), args.max_images
                )
            print(f"[colmap] imported {len(poses)} posed images, "
                  f"{len(points):,} sparse points from {args.from_colmap}")
        else:
            with timer.stage("sparse_sfm"):
                restored = ckpt.restore_sparse(pipeline) if ckpt else False
                if restored:
                    print("[ckpt] restored sparse reconstruction")
                    points = pipeline.points3d.copy()
                    colors = pipeline.point_colors.copy()
                    pipeline.load_images(str(image_dir), args.max_images)
                    poses = dict(pipeline.poses)
                elif args.global_sfm:
                    points, colors, _ = pipeline.reconstruct_global(
                        str(image_dir), args.max_images
                    )
                    poses = dict(pipeline.poses)
                    if ckpt:
                        ckpt.save_sparse(pipeline)
                else:
                    points, colors, _ = pipeline.reconstruct(
                        str(image_dir), args.max_images
                    )
                    poses = dict(pipeline.poses)
                    if ckpt:
                        ckpt.save_sparse(pipeline)

        save_ply(str(output_dir / "sparse.ply"), points, colors)
        pipeline.save_cameras_ply(str(output_dir / "cameras.ply"))
        if poses:
            ids = sorted(poses)
            np.savez(
                output_dir / "poses.npz",
                image_ids=np.asarray(ids, np.int32),
                Rs=np.stack([np.asarray(poses[i][0]) for i in ids]),
                ts=np.stack([np.asarray(poses[i][1]) for i in ids]),
            )
        print(f"  sparse.ply: {len(points):,} points")
        if args.export_colmap and not args.from_colmap:
            pipeline.save_colmap(str(output_dir / "sparse_colmap"))
            print("  sparse_colmap/: COLMAP text model")

        run_dense = (
            (args.mvs or args.stereo or args.dense or args.combined
             or args.mesh)
            and not args.fast
        )
        if run_dense and len(poses) >= 3:
            camera = pipeline.camera
            images = pipeline.image_set.color
            # --mesh fuses the depth maps of whichever dense stage ran
            # (plane-sweep if --stereo was given without --mvs, else MVS)
            mesh_from_stereo = args.mesh and args.stereo and not args.mvs
            mesh_maps, mesh_cloud = None, None

            if args.mvs or (args.mesh and not mesh_from_stereo):
                from recon3d_tpu.dense.patchmatch import PatchMatchMVS

                want_maps = args.mesh and not mesh_from_stereo
                with timer.stage("patchmatch_mvs"):
                    rec = PatchMatchMVS(camera, cfg.patchmatch)
                    # maps only when meshing: pulling V depth maps to host
                    # costs real time over a thin device link
                    out = rec.reconstruct(
                        images, poses, sparse_points=points, mesh=mesh,
                        checkpointer=ckpt, return_maps=want_maps,
                        host_small=pipeline.image_set.prescaled.get(
                            round(float(cfg.patchmatch.scale), 6)
                        ),
                    )
                    dp, dc = out[:2]
                    if want_maps:
                        mesh_maps, mesh_cloud = out[2], (dp, dc)
                        # mirror the stage's own fusion gate
                        # (patchmatch.py: min(min_views, J)) — with few
                        # views the raw min_views count is unreachable
                        # and the mesh would be silently empty
                        j = min(cfg.patchmatch.num_source_views,
                                len(poses) - 1)
                        mesh_min_conf = float(
                            min(cfg.patchmatch.min_views, j)
                        )
                if len(dp):
                    save_ply(str(output_dir / "dense_mvs.ply"), dp, dc)
                    print(f"  dense_mvs.ply: {len(dp):,} points")

            if args.stereo or args.combined:
                from recon3d_tpu.dense.plane_sweep import PlaneSweepReconstructor

                with timer.stage("plane_sweep"):
                    rec = PlaneSweepReconstructor(camera, cfg.plane_sweep)
                    out = rec.reconstruct(
                        images, poses, sparse_points=points, mesh=mesh,
                        return_maps=mesh_from_stereo,
                        host_small=pipeline.image_set.prescaled.get(
                            round(float(cfg.plane_sweep.scale), 6)
                        ),
                    )
                    dp, dc = out[:2]
                    if mesh_from_stereo:
                        mesh_maps, mesh_cloud = out[2], (dp, dc)
                        # mirror the stage's per-ref gate
                        # min(min_views, #neighbors) at its global bound
                        j = min(cfg.plane_sweep.num_neighbors,
                                len(poses) - 1)
                        mesh_min_conf = float(
                            min(cfg.plane_sweep.min_views, j)
                        )
                if len(dp):
                    save_ply(str(output_dir / "dense_stereo.ply"), dp, dc)
                    print(f"  dense_stereo.ply: {len(dp):,} points")

            if args.mesh and mesh_maps is not None and len(mesh_cloud[0]):
                from recon3d_tpu.dense.mesh import (
                    extract_mesh,
                    mesh_vertex_colors,
                )
                from recon3d_tpu.dense.tsdf import fuse_tsdf
                from recon3d_tpu.io.ply import save_mesh_ply

                dp, dc = mesh_cloud
                with timer.stage("tsdf_mesh"):
                    vol = fuse_tsdf(
                        mesh_maps["depth"], mesh_maps["conf"],
                        mesh_maps["K"], mesh_maps["Rs"], mesh_maps["ts"],
                        sparse_points=dp,
                        mesh=mesh,
                        resolution=args.mesh_resolution,
                        # conf counts NCC-consistent views; weight only
                        # pixels the stage's own fusion would keep
                        min_conf=mesh_min_conf,
                    )
                    mv, mf = extract_mesh(vol)
                    mc = mesh_vertex_colors(mv, dp, dc)
                if len(mf):
                    save_mesh_ply(str(output_dir / "mesh.ply"), mv, mf, mc)
                    print(f"  mesh.ply: {len(mv):,} verts, "
                          f"{len(mf):,} faces")

            if args.dense or args.combined:
                from recon3d_tpu.dense.sift_dense import DenseSiftReconstructor

                with timer.stage("dense_sift"):
                    rec = DenseSiftReconstructor(camera, cfg.dense_sift)
                    dp, dc = rec.reconstruct(images, poses)
                if len(dp):
                    save_ply(str(output_dir / "dense.ply"), dp, dc)
                    print(f"  dense.ply: {len(dp):,} points")

    timer.report()
    if args.stats_json:
        import json

        stats = dict(pipeline.stats)
        stats["stage_times_s"] = timer.as_dict()
        stats["num_sparse_points"] = int(len(points))
        with open(args.stats_json, "w") as f:
            json.dump(stats, f, indent=2, default=float)
        print(f"  stats -> {args.stats_json}")
    print(f"DONE. Results in {output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
