"""Compute kernels: SE(3), camera, pyramids, sampling, residuals, robust stats."""
