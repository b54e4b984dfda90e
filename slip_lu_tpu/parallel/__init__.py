"""Multi-chip distribution layer (no reference counterpart — SURVEY.md §2.10).

The reference (cjh10644/SLIP_LU) is single-threaded C; this package is the
TPU-native scaling layer: block-row partition of the working matrix over a
1-D `jax.sharding.Mesh`, pivot-row broadcast and pivot-candidate reduction
via ICI collectives inside `jax.shard_map`, local limb-IPGE updates per
chip. Integer arithmetic is associative, so every topology produces
bit-identical factors (asserted in tests/test_sharded.py).
"""

from .shard import make_mesh, make_mesh_2d, pad_to_multiple
from .factor_shard import factor_dense_limbs_sharded
from .solve_shard import solve_dense_limbs_sharded

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "pad_to_multiple",
    "factor_dense_limbs_sharded",
    "solve_dense_limbs_sharded",
]
