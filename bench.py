"""Framework benchmark: dense MVS depth-map throughput (megapixels/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's plane-sweep defaults (dense_stereo.py:32-37):
scale 0.25, 64 inverse-depth planes, 5x5 NCC patch, k neighbor views. The
baseline denominator was measured by running the reference's torch path on
this host CPU (no CUDA available) with the identical synthetic scene:
4 views of 480x640 -> 4 depth maps of 120x160 in 11.82 s = 0.0065 MP/s
(see BASELINE.md "measured" section).

Throughput counts depth-map pixels produced per second of device time,
steady-state (compile excluded).
"""

import json
import time

import numpy as np

BASELINE_MP_S = 0.0065  # reference torch-CPU plane sweep, measured 2026-08-16

# Scene: mirrors the reference baseline measurement exactly.
H, W, V = 480, 640, 4
SCALE = 0.25
NUM_DEPTHS = 64
PATCH = 5


def main():
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.dense.plane_sweep import sweep_depth_map

    rng = np.random.default_rng(0)
    Hs, Ws = int(H * SCALE), int(W * SCALE)
    K = np.array(
        [[500.0 * SCALE, 0, Ws / 2], [0, 500.0 * SCALE, Hs / 2], [0, 0, 1]],
        np.float32,
    )
    grays = rng.random((V, Hs, Ws), np.float32)
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (V, 3, 3)).copy()
    ts = np.stack(
        [np.array([0.3 * i, 0.0, 0.0], np.float32) for i in range(V)]
    )
    depth_range = jnp.asarray([0.5, 10.0], jnp.float32)

    nbr = [j for j in range(1, V)]  # k = V-1 = 3 neighbors, as in baseline run

    def one_view(ref_idx, src_idx):
        return sweep_depth_map(
            jnp.asarray(grays[ref_idx]),
            jnp.asarray(grays[src_idx]),
            jnp.asarray(K),
            jnp.asarray(Rs[ref_idx]),
            jnp.asarray(ts[ref_idx]),
            jnp.asarray(Rs[src_idx]),
            jnp.asarray(ts[src_idx]),
            depth_range,
            num_depths=NUM_DEPTHS,
            patch=PATCH,
        )

    views = [(i, [j for j in range(V) if j != i][:3]) for i in range(V)]

    # Warm-up / compile.
    for i, nb in views:
        d, c, n = one_view(i, nb)
    jax.block_until_ready(d)

    # Steady state: full pass over all reference views, repeated.
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [one_view(i, nb) for i, nb in views]
        jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    mp = Hs * Ws * V * reps / 1e6
    mp_s = mp / dt
    print(
        json.dumps(
            {
                "metric": "plane_sweep_depthmap_throughput",
                "value": round(mp_s, 4),
                "unit": "MP/s/chip",
                "vs_baseline": round(mp_s / BASELINE_MP_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
