"""Device meshes, shardings, and multi-host bootstrap."""

from .mesh import default_mesh, shard_pairs, process_zero

__all__ = ["default_mesh", "shard_pairs", "process_zero"]
