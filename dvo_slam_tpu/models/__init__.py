"""Tracking and SLAM models: dense tracker, keyframe front end, pose-graph back end."""
