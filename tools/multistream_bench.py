"""Aggregate tracked frames/s/chip with B streams batched on one chip.

Same operating point and timing protocol as bench.py (distinct per-rep
inputs; download-synced), but the tracker is the vmapped multi-stream
engine (parallel/multistream.py).  Reports aggregate fps = B * (T-1) /
elapsed plus the worst per-stream ATE.

Run: PYTHONPATH=/root/repo python tools/multistream_bench.py --streams 4
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--schedule", default="lockstep", choices=["lockstep", "sequential"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker
    from dvo_slam_tpu.utils import synthetic, trajectory

    cfg = benchmark_config().tracker
    shape = (480, 640)
    B, T = args.streams, args.frames

    intensity = np.zeros((B, T) + shape, np.uint8)
    depth = np.zeros((B, T) + shape, np.uint16)
    gt = np.zeros((B, T, 4, 4))
    for b in range(B):
        poses = synthetic.circular_trajectory(
            T, radius=0.05 + 0.005 * b, rot_amplitude=0.02
        )
        gt[b] = poses
        for t in range(T):
            i_img, d_img, v_img = synthetic.render_frame(
                poses[t], TUM_FR1, shape, seed=31 * b + t,
                depth_noise=0.002, intensity_noise=1.0,
            )
            intensity[b, t] = np.clip(i_img, 0, 255).astype(np.uint8)
            depth[b, t] = np.where(v_img, d_img * 5000.0, 0).astype(np.uint16)

    run = make_multistream_tracker(cfg, TUM_FR1, schedule=args.schedule)
    d_int = jnp.asarray(intensity)
    d_dep = jnp.asarray(depth)
    np.asarray(d_int[0, 0, 0, 0])  # force upload

    out = run(d_int, d_dep)  # compile + first execution
    np.asarray(out)

    variants = [d_int.at[:, :, 0, k].add(np.uint8(k + 1)) for k in range(args.reps)]
    for v in variants:
        np.asarray(v[0, 0, 0, 0])
    t0 = time.perf_counter()
    for vi in variants:
        out = run(vi, d_dep)
        np.asarray(out)
    elapsed = (time.perf_counter() - t0) / args.reps
    fps = B * (T - 1) / elapsed

    est = np.concatenate([np.tile(np.eye(4), (B, 1, 1, 1)).reshape(B, 1, 4, 4),
                          np.asarray(out, np.float64)], axis=1)
    stamps = np.arange(T) / 30.0
    ates = [trajectory.ate_rmse(stamps, est[b], stamps, gt[b]) for b in range(B)]

    print(json.dumps({
        "metric": "aggregate_tracked_frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "streams": B,
        "schedule": args.schedule,
        "per_stream_fps": round(fps / B, 2),
        "worst_ate_rmse_m": round(float(max(ates)), 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
