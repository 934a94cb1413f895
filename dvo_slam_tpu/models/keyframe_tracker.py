"""KeyframeTracker: the top-level SLAM facade and keyframe policy.

Replaces the reference KeyframeTracker (dvo_slam/src/keyframe_tracker.cpp):
wires the LocalTracker's accept vote to the keyframe-switch criteria and
feeds completed local maps to the KeyframeGraph back end.

Criteria (AND-combined, in reference registration order,
keyframe_tracker.cpp:66-71):
  1. entropy ratio vs the first frame  > min_entropy_ratio   (:105-121)
  2. divergence rejection with identity-reset                (:123-158)
  3. translational distance to keyframe < max distance       (:160-163)
  4. equation-system constraint ratio                        (:165-168)
  5. condition-number telemetry (always accepts)             (:170-195)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops.camera import Intrinsics
from .dense_tracker import TrackingResult
from .evaluation import LogLikelihoodEvaluation
from .frames import Frame
from .keyframe_graph import KeyframeGraph
from .local_map import LocalMap
from .local_tracker import LocalTracker


class KeyframeTracker:
    """Keyframe-based dense SLAM: front end + policy + back end."""

    def __init__(
        self,
        intrinsics: Intrinsics,
        cfg: Optional[SlamConfig] = None,
        use_threading: Optional[bool] = None,
        graph: Optional[KeyframeGraph] = None,
    ):
        """``graph``: attach an existing back end instead of creating one —
        the checkpoint-resume workflow (utils/serialization.py) restores a
        KeyframeGraph mid-sequence and continues tracking through it."""
        self.cfg = cfg or SlamConfig()
        self.intrinsics = intrinsics
        self.graph = graph if graph is not None else KeyframeGraph(
            intrinsics, self.cfg.graph, self.cfg.tracker, use_threading=use_threading
        )
        self.lt = LocalTracker(intrinsics, self.cfg.tracker)
        self.lt.add_map_initialized_callback(self._on_map_initialized)
        self.lt.add_map_complete_callback(self._on_map_complete)
        for criterion in (
            self._criterion_evaluation,
            self._criterion_divergence,
            self._criterion_distance,
            self._criterion_constraint_ratio,
            self._criterion_condition_number,
        ):
            self.lt.add_accept_criterion(criterion)

        self._evaluation = None
        self._last_transform_to_keyframe = np.eye(4)
        self._initial_transformation = np.eye(4)
        self._previous: Optional[Frame] = None
        self.diagnostics: dict = {}

    # -- map lifecycle -----------------------------------------------------
    def _on_map_initialized(self, lt, local_map: LocalMap, r_odometry: TrackingResult):
        """Reference: keyframe_tracker.cpp:86-96."""
        self._last_transform_to_keyframe = np.asarray(
            r_odometry.transformation, np.float64
        )
        self._evaluation = LogLikelihoodEvaluation(r_odometry)

    def _on_map_complete(self, lt, local_map: LocalMap):
        """Reference: keyframe_tracker.cpp:98-103."""
        local_map.evaluation = self._evaluation
        self.graph.add(local_map)

    # -- accept criteria ---------------------------------------------------
    def _criterion_evaluation(self, lt, r_odometry, r_keyframe):
        ratio = self._evaluation.ratio_with_first(r_keyframe)
        accept = ratio > self.cfg.keyframe.min_entropy_ratio
        if accept:
            self._evaluation.add(r_keyframe)
        self.diagnostics["entropy_ratio"] = ratio
        return accept, r_odometry, r_keyframe

    def _criterion_divergence(self, lt, r_odometry, r_keyframe):
        """Divergence rejection with result rewriting — the cleaned-up
        version of the reference's const_cast hack
        (keyframe_tracker.cpp:123-158): odometry reset to identity with
        nominal information, keyframe estimate reset to the last good
        transform-to-keyframe."""
        odo_t = float(np.linalg.norm(np.asarray(r_odometry.transformation)[:3, 3]))
        kf_t = float(np.linalg.norm(np.asarray(r_keyframe.transformation)[:3, 3]))
        reject = (
            odo_t > 0.1
            or kf_t > 1.5 * self.cfg.keyframe.max_translational_distance
        )
        if reject:
            r_odometry = r_odometry._replace(
                transformation=np.eye(4),
                information=np.eye(6) * (0.008 * 0.008),
            )
            r_keyframe = r_keyframe._replace(
                transformation=np.asarray(self._last_transform_to_keyframe, np.float64)
            )
        self._last_transform_to_keyframe = np.asarray(
            r_keyframe.transformation, np.float64
        )
        return not reject, r_odometry, r_keyframe

    def _criterion_distance(self, lt, r_odometry, r_keyframe):
        kf_t = float(np.linalg.norm(np.asarray(r_keyframe.transformation)[:3, 3]))
        return (
            kf_t < self.cfg.keyframe.max_translational_distance,
            r_odometry,
            r_keyframe,
        )

    def _criterion_constraint_ratio(self, lt, r_odometry, r_keyframe):
        pixels = max(int(r_keyframe.last_level.valid_pixels), 1)
        ratio = int(r_keyframe.last_level.valid_constraints) / pixels
        self.diagnostics["constraint_ratio"] = ratio
        return (
            ratio > self.cfg.keyframe.min_equation_system_constraint_ratio,
            r_odometry,
            r_keyframe,
        )

    def _criterion_condition_number(self, lt, r_odometry, r_keyframe):
        """Telemetry only, always accepts (keyframe_tracker.cpp:170-195)."""
        for name, r in (("odometry", r_odometry), ("keyframe", r_keyframe)):
            info = np.asarray(r.information, np.float64)
            ev = np.sort(np.abs(np.linalg.eigvalsh(info)))
            self.diagnostics[f"condition_number_{name}"] = (
                ev[-1] / ev[0] if ev[0] > 0 else np.inf
            )
        return True, r_odometry, r_keyframe

    # -- runtime reconfiguration (the dynamic_reconfigure analog,
    #    reference: KeyframeTracker::configureTracking/-KeyframeSelection/
    #    -Mapping, keyframe_tracker.cpp:333-352) ---------------------------
    def configure_tracking(self, tracker_cfg):
        """Swap the dense-tracking config; rebuilds the jitted matchers
        (new configs compile on first use, like the reference's
        reconfigure-locked tracker swap)."""
        import dataclasses

        from .frames import BatchedMatcher
        from .constraints import ConstraintProposalValidator

        # drain the optimizer thread before swapping its validator (the
        # reference locks reconfiguration against the running tracker,
        # camera_dense_tracking.cpp:135-156)
        self.graph.wait_for_queue()
        self.cfg = dataclasses.replace(self.cfg, tracker=tracker_cfg)
        self.lt.cfg = tracker_cfg
        self.lt.matcher = BatchedMatcher(tracker_cfg, self.intrinsics)
        self.graph.tracker_cfg = tracker_cfg
        self.graph.validator = ConstraintProposalValidator(
            self.intrinsics, self.graph.cfg, tracker_cfg
        )

    def configure_keyframe_selection(self, keyframe_cfg):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, keyframe=keyframe_cfg)

    def configure_mapping(self, graph_cfg):
        import dataclasses

        from .constraints import ConstraintProposalValidator

        self.graph.wait_for_queue()
        self.cfg = dataclasses.replace(self.cfg, graph=graph_cfg)
        self.graph.cfg = graph_cfg
        self.graph.validator = ConstraintProposalValidator(
            self.intrinsics, graph_cfg, self.graph.tracker_cfg
        )

    # -- public API (reference: keyframe_tracker.h:36-66) ------------------
    def init(self, initial_transformation: Optional[np.ndarray] = None):
        self._initial_transformation = (
            np.eye(4) if initial_transformation is None else np.asarray(initial_transformation)
        )

    def make_frame(self, intensity, depth, valid, timestamp: float) -> Frame:
        return Frame.from_arrays(
            intensity, depth, valid, timestamp, self.cfg.tracker.num_levels
        )

    def make_frame_raw(self, intensity_u8, depth_u16, timestamp: float) -> Frame:
        """Live-camera ingest: raw u8/u16 arrays (3x fewer upload bytes
        than pre-converted floats), on-device conversion, AND the solver
        artifacts prepared in the SAME device program — update() then
        costs two host<->device round trips per frame instead of three
        (the reference's per-frame handleImages path,
        camera_dense_tracking.cpp:187-309)."""
        return Frame.from_raw(
            intensity_u8, depth_u16, timestamp, self.cfg.tracker.num_levels,
            prepare_for=(self.cfg.tracker, self.intrinsics),
        )

    def update(self, frame: Frame) -> np.ndarray:
        """Track one frame; returns its absolute pose
        (reference: keyframe_tracker.cpp:227-246)."""
        if self._previous is None:
            self._previous = frame
            return self._initial_transformation
        if self.lt.local_map is None:
            self.lt.init_new_local_map(
                self._previous, frame, self._initial_transformation
            )
            return self.lt.local_map.current_frame_pose()
        return self.lt.update(frame)

    def force_keyframe(self):
        self.lt.force_complete_current_local_map()

    def finish(self):
        """Flush the current local map and run the final optimization
        (reference: keyframe_tracker.cpp:248-251 + benchmark driver's
        forceKeyframe-on-last-frame, benchmark_slam.cpp:477-481)."""
        if self.lt.local_map is not None and self.lt.local_map.num_frames > 0:
            self._on_map_complete(self.lt, self.lt.local_map)
            self.lt.local_map = None
        self.graph.final_optimization()

    def trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.graph.trajectory()
