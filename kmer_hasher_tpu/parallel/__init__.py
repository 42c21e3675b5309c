from .mesh import make_mesh
from .sharded import ShardedCountStore, ShardedKmerIndex

__all__ = ["make_mesh", "ShardedKmerIndex", "ShardedCountStore"]
