"""dvo_slam_tpu — TPU-native dense RGB-D visual odometry and SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of dvo_slam
(Kerl, Sturm, Cremers; reference at /root/reference): dense photometric +
geometric alignment with t-distribution IRLS Gauss-Newton on SE(3),
keyframe tracking, and a pose-graph back end with loop-closure search —
architected for TPU (dense masked kernels, batched alignment, collective
reductions) rather than ported from the reference's SSE/TBB design.

See SURVEY.md for the structural analysis and build plan.
"""

from .config import (
    GraphConfig,
    InfluenceFunction,
    KeyframeConfig,
    ScaleEstimator,
    SlamConfig,
    TrackerConfig,
)

__version__ = "0.1.0"

__all__ = [
    "GraphConfig",
    "InfluenceFunction",
    "KeyframeConfig",
    "ScaleEstimator",
    "SlamConfig",
    "TrackerConfig",
]
