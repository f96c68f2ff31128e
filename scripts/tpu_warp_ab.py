"""On-chip A/B: Pallas tent-warp f32 vs bf16 MXU contraction, standalone
and through the full PatchMatch bench configuration.

Run on the real TPU: python scripts/tpu_warp_ab.py
(first fetch may stall 0-300 s through the tunnel; timing forces completion
via device-side reduce + host fetch, same discipline as bench.py).
"""

import os
import sys
import time

import numpy as np


def force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    from recon3d_tpu.ops.warp_pallas import bilinear_sample_pallas

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    H, W = 120, 160
    P = 4 * 10 * H * W  # candidates x sources x map — one MVS cost eval
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    coords = jnp.asarray(
        rng.random((P, 2)) * np.array([W - 1.0, H - 1.0]), jnp.float32
    )

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        f = jax.jit(lambda im, c, dt=dt: bilinear_sample_pallas(
            im, c, mxu_dtype=dt)[0])
        force(f(img, coords))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [f(img, coords) for _ in range(8)]
            force(jnp.stack([a.sum() for a in acc]).sum())
            best = min(best, time.perf_counter() - t0)
        print(f"warp[{name}]: {8 * P / best / 1e6:.1f} M samples/s")

    # End-to-end: the bench.py PatchMatch configuration via the env knob.
    import subprocess

    for env_val in ("", "bf16"):
        env = dict(os.environ)
        if env_val:
            env["RECON3D_WARP_MXU_DTYPE"] = env_val
        else:
            env.pop("RECON3D_WARP_MXU_DTYPE", None)
        out = subprocess.run(
            [sys.executable, "bench.py"], env=env, capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        )
        tag = env_val or "f32"
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(f"bench[{tag}]: {line[-1] if line else out.stdout[-200:]}")


if __name__ == "__main__":
    main()
