from .mesh import AXIS, make_mesh, replicated, shard_leading

__all__ = ["AXIS", "make_mesh", "shard_leading", "replicated"]
