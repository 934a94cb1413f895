"""Multi-chip scaling: meshes, sharded batched alignment, distributed BA."""
