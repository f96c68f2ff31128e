"""On-chip A/B: Pallas tent-warp kernel vs XLA gather sampling.

Run on the real TPU: python scripts/tpu_warp_ab.py
(first fetch may stall 0-300 s through the tunnel; timing forces completion
via device-side reduce + host fetch, same discipline as bench.py).

Historical note (2026-08-18, v5e): a bf16 MXU-contraction variant of the
kernel was measured here at 228 vs 221 M samples/s standalone (+3%) but
2.856 vs 2.958 MP/s on the end-to-end PatchMatch bench (-3%) — the warp
contraction is not the dense-path bottleneck once fused, so the option was
removed (ops/warp_pallas.py is exact-f32 only).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.ops.image import bilinear_sample
    from recon3d_tpu.ops.warp_pallas import bilinear_sample_pallas

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    H, W = 120, 160
    P = 4 * 10 * H * W  # candidates x sources x map — one MVS cost eval
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    coords = jnp.asarray(
        rng.random((P, 2)) * np.array([W - 1.0, H - 1.0]), jnp.float32
    )

    for name, base in (
        ("pallas-tent", lambda im, c: bilinear_sample_pallas(im, c)[0]),
        ("xla-gather", lambda im, c: bilinear_sample(im, c)[0]),
    ):
        f = jax.jit(base)
        force(f(img, coords))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [f(img, coords) for _ in range(8)]
            force(jnp.stack([a.sum() for a in acc]).sum())
            best = min(best, time.perf_counter() - t0)
        print(f"warp[{name}]: {8 * P / best / 1e6:.1f} M samples/s")

    # End-to-end: the bench.py PatchMatch configuration.
    import subprocess

    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    print(f"bench: {line[-1] if line else out.stdout[-200:]}")


if __name__ == "__main__":
    main()
