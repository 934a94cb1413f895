"""Loop-closure constraint proposals: two-stage batched validation.

Replaces the reference's constraints subsystem
(dvo_slam/src/constraints/*): candidate keyframe pairs become
ConstraintProposals, validated by a two-stage pipeline — a coarse
single-level screen and a fine full-pyramid refinement — with voter-based
accept/reject (built at keyframe_graph.cpp:500-522).

TPU-native translation (SURVEY.md section 2.5, P4): where the reference
fans proposals across TBB threads with thread-local DenseTracker pools
(keyframe_graph.cpp:555-593), every stage here is ONE batched vmapped
alignment over all live proposals; voting stays on host (cheap, branchy).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import GraphConfig, TrackerConfig
from ..ops.camera import Intrinsics
from .dense_tracker import TrackingResult
from .evaluation import TrackingResultEvaluation
from .frames import BatchedMatcher, Keyframe, TwoStageMatcher
from .local_tracker import result_is_nan


@dataclass
class Vote:
    """Reference: ConstraintProposal::Vote (constraint_proposal.h)."""

    accept: bool
    score: float = 0.0
    reason: str = ""


@dataclass
class ConstraintProposal:
    """Candidate loop edge (reference: constraint_proposal.h/cpp).

    ``initial_pose`` is in result/pose space (current-in-reference); the
    reference stores the warp in its InitialTransformation slot, which our
    pose-space match API inverts internally — the two are equivalent.
    """

    reference: Keyframe
    current: Keyframe
    initial_pose: np.ndarray
    result: Optional[TrackingResult] = None
    votes: List[Vote] = field(default_factory=list)

    @property
    def total_score(self) -> float:
        return sum(v.score for v in self.votes)

    @property
    def accept(self) -> bool:
        return all(v.accept for v in self.votes)

    @property
    def reject(self) -> bool:
        return any(not v.accept for v in self.votes)

    def same_frames(self, other: "ConstraintProposal") -> bool:
        a = (self.reference.id, self.current.id)
        b = (other.reference.id, other.current.id)
        return a == b or a == b[::-1]

    def inverse(self) -> "ConstraintProposal":
        return ConstraintProposal(
            reference=self.current,
            current=self.reference,
            initial_pose=np.linalg.inv(self.initial_pose),
        )

    @staticmethod
    def with_identity(reference: Keyframe, current: Keyframe) -> "ConstraintProposal":
        return ConstraintProposal(reference, current, np.eye(4))

    @staticmethod
    def with_relative(reference: Keyframe, current: Keyframe) -> "ConstraintProposal":
        """Initialize from current graph poses: pose-space init
        reference.pose^{-1} current.pose (the warp-space
        current.pose^{-1} * reference.pose of constraint_proposal.cpp:44)."""
        init = np.linalg.inv(reference.pose) @ current.pose
        return ConstraintProposal(reference, current, init)


def validation_tracker_config(base: TrackerConfig) -> TrackerConfig:
    """Stage-1 coarse screen config: single coarsest level.

    The reference hard-codes levels 3->3 for its 4-level pyramids
    (configureValidationTracking, keyframe_graph.cpp:829-837); expressed
    relative to the base config so shallower test pyramids work too."""
    return dataclasses.replace(
        TrackerConfig(),
        first_level=base.first_level,
        last_level=base.first_level,
        precision=base.precision,
        use_initial_estimate=True,
        mu=base.mu,
        intensity_derivative_threshold=base.intensity_derivative_threshold,
        depth_derivative_threshold=base.depth_derivative_threshold,
    )


def constraint_tracker_config(base: TrackerConfig) -> TrackerConfig:
    """Stage-2 fine refinement config: full pyramid down to the base
    config's finest level.

    The reference hard-codes 3->1 (keyframe_graph.cpp:819-828), which
    coincides with its deployed tracking config's last level — and the
    entropy-ratio voter depends on that coincidence: it compares the
    proposal's log-likelihood against the keyframe's running average from
    tracking, which only has matching scale when both solve down to the
    same level.  Following base.last_level preserves that invariant for
    any configuration."""
    return dataclasses.replace(
        TrackerConfig(),
        first_level=base.first_level,
        last_level=base.last_level,
        precision=base.precision,
        use_initial_estimate=True,
        mu=base.mu,
        intensity_derivative_threshold=base.intensity_derivative_threshold,
        depth_derivative_threshold=base.depth_derivative_threshold,
    )


def _constraint_ratio(r: TrackingResult) -> float:
    pixels = max(int(r.last_level.valid_pixels), 1)
    return int(r.last_level.valid_constraints) / pixels


class ConstraintProposalValidator:
    """Two-stage batched proposal validation
    (reference: constraint_proposal_validator.cpp:69-160).

    Stage 1 (coarse, keep all): voters = odometry-reject, NaN, constraint
    ratio, entropy ratio (coarse), cross-validation (forward+backward
    agreement).  Stage 2 (fine, keep best per pair): NaN, constraint
    ratio, entropy ratio (fine).
    """

    # Prepared-artifact LRU budget, in FRAMES per matcher (~12 MB each at
    # 640x480 under the fine config): keyframes recur across validation
    # waves — the new keyframe is matched against its neighbors now and
    # re-matched in the dense final re-search — and a re-PREPARE costs a
    # full dispatch round trip per frame per wave (~30 ms through this
    # sandbox's relay; the round-3 evict-everything policy made that ~6
    # dispatches per keyframe event).  32 frames ≈ 400 MB, a sliver of a
    # 16 GB chip.
    MAX_CACHED_FRAMES = 32

    def __init__(
        self,
        intrinsics: Intrinsics,
        graph_cfg: GraphConfig,
        tracker_cfg: TrackerConfig,
    ):
        self.cfg = graph_cfg
        fine_cfg = constraint_tracker_config(tracker_cfg)
        coarse_cfg = validation_tracker_config(tracker_cfg)
        # Stage 1 (coarse screen) matches over stage 2's FINE prepared
        # artifacts: per-level artifacts are identical between the two
        # configs (same thresholds/backend; the configs differ only in
        # which levels they solve), so one prepared set per frame serves
        # both stages — stage 1's own prepare dispatch is deleted and
        # stage 2 never re-prepares frames stage 1 already touched.
        self.stage2_matcher = BatchedMatcher(fine_cfg, intrinsics)
        self.stage1_matcher = BatchedMatcher(
            coarse_cfg, intrinsics, artifact_cfg=fine_cfg,
        )
        # Fused wave (default): both stages + both directions in ONE
        # device dispatch (TwoStageMatcher); the staged matchers above
        # remain the parity oracle (use_fused_wave=False) and the evict
        # surface.  Round 4 measured the staged form's per-event host
        # round trips at 13.4 ms/frame — 46% of the e2e budget.
        self.use_fused_wave = True
        self.two_stage = TwoStageMatcher(coarse_cfg, fine_cfg, intrinsics)
        self._lru: Dict[int, object] = {}  # id(frame) -> frame, insertion-ordered

    def _retain(self, frames):
        """LRU-retain prepared artifacts for the wave's frames; evict the
        least-recently-validated beyond the budget (keyframe Frames live
        in the graph forever — the artifact cache must not)."""
        for f in frames:
            self._lru.pop(id(f), None)
            self._lru[id(f)] = f
        while len(self._lru) > self.MAX_CACHED_FRAMES:
            _, old = next(iter(self._lru.items()))
            del self._lru[id(old)]
            self.stage1_matcher.evict(old)
            self.stage2_matcher.evict(old)

    def validate(self, proposals: List[ConstraintProposal]) -> List[ConstraintProposal]:
        touched = {
            id(f): f
            for p in proposals
            for f in (p.reference.frame, p.current.frame)
        }
        try:
            if self.use_fused_wave and proposals:
                proposals = self._validate_fused(proposals)
            else:
                proposals = self._stage1(proposals)
                proposals = self._stage2(proposals)
        finally:
            self._retain(touched.values())
        return proposals

    def _validate_fused(
        self, proposals: List[ConstraintProposal]
    ) -> List[ConstraintProposal]:
        """Both stages from ONE fused device wave (TwoStageMatcher): the
        voting below is the SAME host logic as the staged path, applied
        to precomputed results — stage 2's matches were seeded on device
        by their own direction's stage-1 transformation, exactly what
        _update_initials feeds the staged stage-2 dispatch."""
        quads = self.two_stage.match_pairs(
            [
                (p.reference.frame, p.current.frame, p.initial_pose)
                for p in proposals
            ]
        )
        pairs = []
        stage2_result = {}
        for p, (r1f, r1b, r2f, r2b) in zip(proposals, quads):
            inv = p.inverse()
            p.result, p.votes = r1f, []
            inv.result, inv.votes = r1b, []
            pairs.append((p, inv))
            stage2_result[id(p)] = r2f
            stage2_result[id(inv)] = r2b
        survivors = self._stage1_vote(pairs)
        for p in survivors:
            p.result, p.votes = stage2_result[id(p)], []
        return self._stage2_vote(survivors)

    # -- stages -----------------------------------------------------------
    def _match_all(self, matcher: BatchedMatcher, proposals):
        results = matcher.match_many(
            [(p.reference.frame, p.current.frame, p.initial_pose) for p in proposals]
        )
        for p, r in zip(proposals, results):
            p.result = r
            p.votes = []

    def _stage1(self, proposals: List[ConstraintProposal]) -> List[ConstraintProposal]:
        if not proposals:
            return []
        # cross-validation: add the inverse of every proposal
        pairs = []
        additional = []
        for p in proposals:
            inv = p.inverse()
            pairs.append((p, inv))
            additional.append(inv)

        self._match_all(self.stage1_matcher, proposals + additional)
        return self._stage1_vote(pairs)

    def _stage1_vote(self, pairs) -> List[ConstraintProposal]:
        """Stage-1 voting/removal over matched (forward, backward) pairs
        (results already attached)."""
        inverse_of = {}
        for a, b in pairs:
            inverse_of[id(a)] = b
            inverse_of[id(b)] = a
        all_props = [p for fb in pairs for p in fb]

        for p in all_props:
            self._vote(
                p,
                [
                    self._vote_odometry,
                    self._vote_nan,
                    lambda q: self._vote_ratio(q, self.cfg.min_equation_system_constraint_ratio),
                    lambda q: self._vote_entropy(
                        q, self.cfg.new_constraint_min_entropy_ratio_coarse
                    ),
                    lambda q: self._vote_cross_validation(q, inverse_of[id(q)]),
                ],
            )

        # remove the worse half of each forward/backward pair
        # (CrossValidationVoter::removeAdditionalProposals,
        # constraint_proposal_voter.cpp:48-65)
        removed = set()
        for fwd, bwd in pairs:
            worse = bwd if (fwd.total_score >= bwd.total_score and fwd.accept) else fwd
            removed.add(id(worse))
        survivors = [p for p in all_props if id(p) not in removed and not p.reject]
        self._update_initials(survivors)
        return survivors

    def _stage2(self, proposals: List[ConstraintProposal]) -> List[ConstraintProposal]:
        if not proposals:
            return []
        self._match_all(self.stage2_matcher, proposals)
        return self._stage2_vote(proposals)

    def _stage2_vote(
        self, proposals: List[ConstraintProposal]
    ) -> List[ConstraintProposal]:
        """Stage-2 voting + keep-best (results already attached)."""
        for p in proposals:
            self._vote(
                p,
                [
                    self._vote_nan,
                    lambda q: self._vote_ratio(q, self.cfg.min_equation_system_constraint_ratio),
                    lambda q: self._vote_entropy(
                        q, self.cfg.new_constraint_min_entropy_ratio_fine
                    ),
                ],
            )
        proposals = [p for p in proposals if not p.reject]
        proposals = self._keep_best(proposals)
        self._update_initials(proposals)
        return proposals

    @staticmethod
    def _vote(p: ConstraintProposal, voters):
        for voter in voters:
            p.votes.append(voter(p))
            if not p.votes[-1].accept:
                break  # early abort (constraint_proposal_validator.cpp:155-158)

    @staticmethod
    def _keep_best(proposals: List[ConstraintProposal]) -> List[ConstraintProposal]:
        """One proposal per frame pair, highest total score
        (constraint_proposal_validator.cpp:104-130)."""
        out: List[ConstraintProposal] = []
        for p in proposals:
            for i, q in enumerate(out):
                if p.same_frames(q):
                    if p.total_score > q.total_score:
                        out[i] = p
                    break
            else:
                out.append(p)
        return out

    @staticmethod
    def _update_initials(proposals):
        """Feed each stage's estimate to the next as its initial pose
        (constraint_proposal_validator.cpp:95-100)."""
        for p in proposals:
            p.initial_pose = np.asarray(p.result.transformation, np.float64)

    # -- voters -----------------------------------------------------------
    @staticmethod
    def _vote_odometry(p: ConstraintProposal) -> Vote:
        is_odo = abs(p.reference.id - p.current.id) <= 1
        return Vote(not is_odo, reason=f"OdometryConstraint {is_odo}")

    @staticmethod
    def _vote_nan(p: ConstraintProposal) -> Vote:
        nan = result_is_nan(p.result)
        return Vote(not nan, reason=f"NaNResult {nan}")

    @staticmethod
    def _vote_ratio(p: ConstraintProposal, threshold: float) -> Vote:
        ratio = _constraint_ratio(p.result)
        return Vote(ratio >= threshold, reason=f"ConstraintRatio {ratio:.3f}")

    @staticmethod
    def _vote_entropy(p: ConstraintProposal, threshold: float) -> Vote:
        evaluation: TrackingResultEvaluation = p.reference.evaluation
        if evaluation is None:
            return Vote(False, reason="no evaluation")
        ratio = evaluation.ratio_with_average(p.result)
        return Vote(ratio >= threshold, score=ratio, reason=f"Entropy {ratio:.3f}")

    @staticmethod
    def _vote_cross_validation(
        p: ConstraintProposal, inverse: "ConstraintProposal", threshold: float = 1.0
    ) -> Vote:
        """Forward and backward estimates must compose to ~identity
        (constraint_proposal_voter.cpp:67-89)."""
        T_f = np.asarray(p.result.transformation, np.float64)
        T_b = np.asarray(inverse.result.transformation, np.float64)
        diff = np.linalg.norm((T_b @ T_f)[:3, 3])
        return Vote(diff <= threshold, reason=f"CrossValidation {diff:.3f}")
