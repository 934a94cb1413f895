"""Data-parallel end-to-end SLAM over a device mesh.

The whole-pipeline contract of the reference is one sequence through
front end + loop closure + final optimization
(dvo_benchmark/src/benchmark_slam.cpp:352-525).  The DP scaling form runs
B independent sequences, ONE PER DEVICE: the scanned streaming front end
(models/streaming.py) is vmapped over the batch axis and the batch axis
is sharded over the mesh, so each device executes exactly the
single-stream program (the measured-optimal schedule — BASELINE.md's
gather study: lockstep batching on one chip is index-rate bound, DP over
a mesh keeps the single-stream program per device).  The per-stream back
ends (keyframe graph, validation waves, final optimization) then replay
each stream's records — the host-side work the reference itself runs on
a background thread per map (keyframe_graph.cpp:401-432).

This is the structure-verification form for multi-chip e2e SLAM: on a
virtual CPU mesh it proves the sharded whole-pipeline program compiles
and executes and that every stream's trajectory passes its accuracy
gate; on real hardware the same code is the scaling path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..models.streaming import (
    StreamingSLAM,
    _decode,
    host_reduce_ingest,
    make_streaming_frontend,
)
from ..ops.camera import Intrinsics
from .mesh import BATCH_AXIS, batch_sharding


class DataParallelSLAM:
    """B-sequence end-to-end SLAM, front end DP-sharded over a mesh.

    ``track_sequences(iu8 [B,T,H,W], du16 [B,T,H,W], timestamps [T])``
    runs the vmapped+sharded front-end scan (one stream per device), then
    replays every stream's records through its own KeyframeGraph back end
    and final optimization.  Returns online poses [B, T, 4, 4]; the
    per-stream optimized trajectories are available via ``slams[b]``.
    """

    def __init__(
        self,
        intrinsics: Intrinsics,
        cfg: Optional[SlamConfig] = None,
        mesh=None,
        ingest_level: Optional[int] = None,
    ):
        self.cfg = cfg or SlamConfig()
        self.intrinsics = intrinsics
        self.mesh = mesh
        self.ingest_level = (
            min(self.cfg.tracker.last_level, 3)
            if ingest_level is None
            else ingest_level
        )
        front = make_streaming_frontend(
            self.cfg, intrinsics, ingest_level=self.ingest_level
        )
        # vmap over streams; jit so the whole B-stream scan is ONE
        # program XLA partitions over the mesh (SPMD)
        self._front_b = jax.jit(jax.vmap(front))
        self.slams: List[StreamingSLAM] = []

    def track_sequences(
        self,
        intensity_u8,
        depth_u16,
        timestamps,
        force_last: bool = True,
        finish: bool = True,
    ) -> np.ndarray:
        iu8 = np.asarray(intensity_u8)
        du16 = np.asarray(depth_u16)
        b, t = iu8.shape[:2]
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            if b % n_dev != 0:
                raise ValueError(
                    f"batch {b} must be a multiple of the mesh size {n_dev} "
                    f"(one or more whole streams per device)"
                )
        force = np.zeros((b, t), bool)
        if force_last:
            force[:, -1] = True  # benchmark_slam.cpp:477-481
        init = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4))

        if self.ingest_level:
            iu_r, du_r = host_reduce_ingest(
                iu8.reshape((-1,) + iu8.shape[2:]),
                du16.reshape((-1,) + du16.shape[2:]),
                self.ingest_level,
            )
            iu_r = iu_r.reshape((b, t) + iu_r.shape[1:])
            du_r = du_r.reshape((b, t) + du_r.shape[1:])
        else:
            iu_r, du_r = iu8, du16

        if self.mesh is not None:
            shard = batch_sharding(self.mesh, BATCH_AXIS)
            put = lambda x: jax.device_put(jnp.asarray(x), shard)
        else:
            put = jnp.asarray
        raw = np.asarray(
            self._front_b(put(iu_r), put(du_r), put(force), put(init))
        )  # [B, T, record] — one gather for the whole fleet

        # per-stream back ends: replay + loop closure + final pass (host
        # work + per-stream validation waves; on real multi-host hardware
        # each stream's host drives its own chip)
        self.slams = []
        poses = np.zeros((b, t, 4, 4))
        for s in range(b):
            slam = StreamingSLAM(
                self.intrinsics, self.cfg, ingest_level=self.ingest_level
            )
            records = [_decode(raw[s, i]) for i in range(t)]
            slam.records = records
            slam._replay(records, iu8[s], du16[s], timestamps)
            if finish:
                slam.graph.final_optimization()
            else:
                slam.graph.wait_for_queue()
            poses[s] = np.stack([r.pose for r in records])
            self.slams.append(slam)
        return poses

    def trajectories(self) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Per-stream optimized (stamps, poses) from the back ends."""
        return [s.trajectory() for s in self.slams]

    def shutdown(self):
        for s in self.slams:
            s.graph.shutdown()
