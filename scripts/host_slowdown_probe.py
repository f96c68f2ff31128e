"""Minimal reproducer + attribution probe for the post-device-burst host
slowdown (BASELINE.md caveat: plain numpy runs 10-50x slower for tens of
seconds right after heavy device phases on this single-vCPU tunneled host).

Protocol:
  1. time a fixed numpy workload N times          -> baseline distribution
  2. run a heavy device burst (jitted matmul scan, forced fetch)
  3. re-time the same workload every ~0.5 s for a window, recording
     per-iteration wall time AND per-thread CPU deltas of this process
     (/proc/self/task/*/stat) plus system-wide CPU (/proc/stat)
  4. print a timeline: who consumed the core while numpy was slow

Run on the tunneled TPU host:  python scripts/host_slowdown_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLK = os.sysconf("SC_CLK_TCK")


def thread_cpu() -> dict:
    """{tid: (name, cpu_seconds)} for every thread of this process."""
    out = {}
    for tid in os.listdir("/proc/self/task"):
        try:
            with open(f"/proc/self/task/{tid}/stat") as f:
                parts = f.read().rsplit(")", 1)
                name = parts[0].split("(", 1)[1]
                f2 = parts[1].split()
                utime, stime = int(f2[11]), int(f2[12])
            out[tid] = (name, (utime + stime) / CLK)
        except OSError:
            pass
    return out


def system_cpu() -> tuple:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) / CLK for v in parts]
    idle = vals[3] + vals[4]
    return sum(vals), idle


def workload() -> float:
    """Fixed numpy work: ~0.05 s at healthy speed (resize-like strided
    float ops + a small matmul, matching the pipeline's host prep)."""
    t0 = time.perf_counter()
    a = np.random.default_rng(0).random((480, 640, 3)).astype(np.float32)
    for _ in range(4):
        b = a[::2, ::2] * 0.25 + a[1::2, ::2] * 0.25 + a[::2, 1::2] * 0.25 \
            + a[1::2, 1::2] * 0.25
        c = b.reshape(-1, 3) @ np.float32([[0.299], [0.587], [0.114]])
        c.sum()
    return time.perf_counter() - t0


def fetch_probe():
    """Phase 2 hypothesis: the slowdown appears only while LARGE
    device->host downloads are in flight — the stdio tunnel relay is a
    separate process doing CPU-heavy framing on the same single vCPU, so
    numpy is descheduled for most of each fetch.  Time the workload (a)
    between large fetches, (b) with an async fetch in flight, and report
    the relay's CPU share from /proc/stat deltas."""
    import jax
    import jax.numpy as jnp

    big = jnp.asarray(np.random.default_rng(2).random((32, 1024, 1024),
                                                      np.float32))  # 128 MB
    big = (big * 1.000001).block_until_ready()  # materialize on device

    base = [workload() for _ in range(8)]
    print(f"[fetch] baseline: med {np.median(base)*1e3:.1f} ms", flush=True)

    # (a) sequential: big fetch, then immediately time numpy
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(big[rep % 32])  # 4 MB download
        t_fetch = time.perf_counter() - t0
        times = [workload() for _ in range(4)]
        print(f"[fetch] after 4MB fetch ({t_fetch:.2f}s): "
              f"workload med {np.median(times)*1e3:.1f} ms", flush=True)

    # (b) concurrent: start an async fetch of the full 128 MB, time numpy
    # while the relay drains it
    prev_sys, prev_idle = system_cpu()
    prev_me = sum(c for _, c in thread_cpu().values())
    fut = jax.device_get(big)  # device_get is sync; use copy_to_host_async
    del fut
    arrs = [big[i] for i in range(32)]
    for a in arrs:
        a.copy_to_host_async()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 30.0:
        w = workload()
        cur_sys, cur_idle = system_cpu()
        me = sum(c for _, c in thread_cpu().values())
        dt = max(cur_sys - prev_sys, 1e-9)
        print(f"[fetch] t={time.perf_counter()-t0:5.1f}s in-flight "
              f"workload {w*1e3:7.1f} ms  sys_busy {100*(1-(cur_idle-prev_idle)/dt):5.1f}%  "
              f"me {100*(me-prev_me)/dt:5.1f}%", flush=True)
        prev_sys, prev_idle, prev_me = cur_sys, cur_idle, me
        n += 1
        if n == 3:  # force the drain to actually complete mid-window
            t1 = time.perf_counter()
            _ = [np.asarray(a) for a in arrs]
            print(f"[fetch] 128MB drain completed in "
                  f"{time.perf_counter()-t1:.1f}s", flush=True)
    tail = [workload() for _ in range(5)]
    print(f"[fetch] final: med {np.median(tail)*1e3:.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    if "--fetch" in sys.argv:
        fetch_probe()
        return

    base = [workload() for _ in range(10)]
    print(f"baseline workload: med {np.median(base)*1e3:.1f} ms "
          f"(min {min(base)*1e3:.1f}, max {max(base)*1e3:.1f})", flush=True)

    # device burst: ~10 s of matmuls with a forced result fetch
    @jax.jit
    def burst(x):
        def step(c, _):
            return jnp.tanh(c @ c) * 1.001, None
        y, _ = jax.lax.scan(step, x, None, length=64)
        return jnp.sum(y)

    x = jnp.asarray(np.random.default_rng(1).random((2048, 2048), np.float32))
    t0 = time.time()
    n_bursts = 0
    while time.time() - t0 < 10.0:
        float(burst(x))  # force completion + download each round
        n_bursts += 1
    print(f"device burst done ({n_bursts} rounds, {time.time()-t0:.1f}s)",
          flush=True)

    prev_threads = thread_cpu()
    prev_sys, prev_idle = system_cpu()
    t_start = time.time()
    print(f"{'t(s)':>6} {'work(ms)':>9} {'sys_cpu%':>8} {'idle%':>6}  "
          f"top-threads(dcpu)", flush=True)
    while time.time() - t_start < 45.0:
        w = workload()
        cur = thread_cpu()
        cur_sys, cur_idle = system_cpu()
        dt_sys = max(cur_sys - prev_sys, 1e-9)
        d_idle = cur_idle - prev_idle
        deltas = []
        for tid, (name, c) in cur.items():
            p = prev_threads.get(tid, (name, 0.0))[1]
            if c - p > 0.01:
                deltas.append((c - p, name, tid))
        deltas.sort(reverse=True)
        top = " ".join(f"{n}:{d:.2f}" for d, n, _ in deltas[:4])
        print(f"{time.time()-t_start:6.1f} {w*1e3:9.1f} "
              f"{100*(1-d_idle/dt_sys):8.1f} {100*d_idle/dt_sys:6.1f}  {top}",
              flush=True)
        prev_threads, prev_sys, prev_idle = cur, cur_sys, cur_idle
        time.sleep(0.4)

    tail = [workload() for _ in range(5)]
    print(f"final workload: med {np.median(tail)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
