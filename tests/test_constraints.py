"""ConstraintProposalValidator: fused single-dispatch wave vs the staged
two-dispatch oracle (reference: constraint_proposal_validator.cpp:69-160).

The fused TwoStageMatcher computes stage 1 (both directions) AND stage 2
(both directions, seeded by their own stage-1 result) in one device
program; the host applies the exact same voting to the precomputed
results.  These tests pin the equivalence.
"""

import numpy as np
import pytest

from dvo_slam_tpu.config import GraphConfig, TrackerConfig
from dvo_slam_tpu.models.constraints import (
    ConstraintProposal,
    ConstraintProposalValidator,
)
from dvo_slam_tpu.models.frames import Frame, Keyframe
from dvo_slam_tpu.models.streaming import _ReplayEvaluation
from dvo_slam_tpu.ops.camera import Intrinsics
from dvo_slam_tpu.utils import synthetic

K = Intrinsics(80.0, 80.0, 39.5, 29.5)
SHAPE = (60, 80)
TCFG = TrackerConfig(first_level=1, last_level=0, use_initial_estimate=True)
GCFG = GraphConfig(
    new_constraint_min_entropy_ratio_coarse=0.01,
    new_constraint_min_entropy_ratio_fine=0.1,
)


def _keyframes(n=8):
    poses = synthetic.circular_trajectory(n, radius=0.12, rot_amplitude=0.04)
    kfs = []
    for i, p in enumerate(poses):
        i_, d_, v_ = synthetic.render_frame(
            p, K, SHAPE, seed=i, depth_noise=0.002, intensity_noise=1.0
        )
        f = Frame.from_arrays(i_, d_, v_, i / 30.0, TCFG.num_levels)
        kfs.append(
            Keyframe(id=i + 1, frame=f, pose=p.copy(),
                     evaluation=_ReplayEvaluation(100.0))
        )
    return kfs


def _proposals(kfs):
    props = []
    for a, b in [(0, 3), (0, 5), (1, 6), (2, 7), (7, 0)]:
        props.append(ConstraintProposal.with_identity(kfs[a], kfs[b]))
        props.append(ConstraintProposal.with_relative(kfs[a], kfs[b]))
    return props


@pytest.mark.slow
def test_fused_wave_matches_staged_oracle():
    """The fused wave must accept the same pairs, pick the same
    directions, and produce (near-)identical transformations as the
    staged two-dispatch path."""
    kfs = _keyframes()

    v_fused = ConstraintProposalValidator(K, GCFG, TCFG)
    assert v_fused.use_fused_wave  # the default
    acc_f = v_fused.validate(_proposals(kfs))

    v_staged = ConstraintProposalValidator(K, GCFG, TCFG)
    v_staged.use_fused_wave = False
    acc_s = v_staged.validate(_proposals(kfs))

    pf = sorted((p.reference.id, p.current.id) for p in acc_f)
    ps = sorted((p.reference.id, p.current.id) for p in acc_s)
    assert pf == ps
    assert len(pf) > 0  # the scene produces real loop closures
    tf = {(p.reference.id, p.current.id): np.asarray(p.result.transformation)
          for p in acc_f}
    ts = {(p.reference.id, p.current.id): np.asarray(p.result.transformation)
          for p in acc_s}
    for k in tf:
        np.testing.assert_allclose(tf[k], ts[k], atol=1e-5)
    # stage-2 feed-forward: accepted proposals carry their refined pose
    for p in acc_f:
        np.testing.assert_array_equal(
            p.initial_pose, np.asarray(p.result.transformation, np.float64)
        )


@pytest.mark.slow
def test_fused_wave_rejects_unmatchable_pair():
    """A proposal between unrelated scenes must be rejected by the fused
    path's voting just like the staged path (NaN/ratio/cross-validation
    all see the same precomputed results)."""
    kfs = _keyframes(4)
    # a frame of a completely different scene
    i_, d_, v_ = synthetic.render_frame(
        np.eye(4), K, SHAPE, seed=99, depth_noise=0.3, intensity_noise=40.0
    )
    alien = Keyframe(
        id=40,
        frame=Frame.from_arrays(i_, d_, v_, 9.9, TCFG.num_levels),
        pose=np.eye(4),
        evaluation=_ReplayEvaluation(100.0),
    )
    props = [ConstraintProposal.with_identity(kfs[0], alien)]
    v = ConstraintProposalValidator(K, GCFG, TCFG)
    accepted = v.validate(props)
    vs = ConstraintProposalValidator(K, GCFG, TCFG)
    vs.use_fused_wave = False
    accepted_staged = vs.validate([ConstraintProposal.with_identity(kfs[0], alien)])
    assert [(p.reference.id, p.current.id) for p in accepted] == [
        (p.reference.id, p.current.id) for p in accepted_staged
    ]


@pytest.mark.slow
def test_two_stage_matcher_chunks_past_eight_pairs():
    """match_pairs chunks waves past 8 pairs (each slot is 4 unrolled
    solves); results must be ordered 1:1 with the requests and identical
    to matching the same pair in a smaller wave."""
    from dvo_slam_tpu.models.constraints import constraint_tracker_config, \
        validation_tracker_config
    from dvo_slam_tpu.models.frames import TwoStageMatcher

    kfs = _keyframes(6)
    m = TwoStageMatcher(
        validation_tracker_config(TCFG), constraint_tracker_config(TCFG), K
    )
    reqs = []
    for a in range(6):
        for b in range(6):
            if a != b and len(reqs) < 10:
                reqs.append((kfs[a].frame, kfs[b].frame, np.eye(4)))
    out = m.match_pairs(reqs)  # 10 pairs -> chunks of 8 + 2
    assert len(out) == len(reqs)
    solo = m.match_pairs(reqs[:1])[0]
    for r_big, r_solo in zip(out[0], solo):
        np.testing.assert_allclose(
            r_big.transformation, r_solo.transformation, atol=1e-5
        )
    for quad in out:
        for r in quad:
            assert np.isfinite(r.transformation).all()
