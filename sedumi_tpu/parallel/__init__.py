from .mesh import make_mesh, shard_aop, shard_state, replicate

__all__ = ["make_mesh", "shard_aop", "shard_state", "replicate"]
