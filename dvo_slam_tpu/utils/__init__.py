"""Host-side utilities: dataset IO, trajectories, synthetic scenes, timers."""
