"""Multi-chip parallelism: mesh construction and sharded top-k merge.

The reference is single-process with zero IPC (SURVEY.md §2 parallelism
table). Here scaling is SPMD over a ``jax.sharding.Mesh``: the embedding
store is sharded across the ``index`` axis of the mesh, the encoder batch
across the ``data`` axis, and the cross-chip top-k merge is an ``all_gather``
of per-chip candidates inside ``shard_map`` — collectives compiled by XLA
onto ICI (SURVEY.md §5 distributed plan).
"""

from sema_tpu.parallel.mesh import make_mesh, default_mesh
from sema_tpu.parallel.sharded_topk import sharded_topk

__all__ = ["make_mesh", "default_mesh", "sharded_topk"]
