"""Multi-chip parallelism over a JAX device mesh.

The reference scales by staging (head-partition x tail-partition) blocks of
the embedding tables between CPU RAM and GPU HBM under an orthogonal episode
schedule (include/core/solver.h:519-575, 873-887). On TPU the tables stay
HBM-resident and *sharded*: partition p of the head-role table lives on
device p for the whole run, while the tail-role shard (and its negative
alias table and optimizer moments) rotates around the ring via `ppermute`
between episodes — the episode schedule reborn as static ICI communication.

Guarantees preserved from the reference:
* at any episode, no two devices read or write the same partition
  (solver.h:563-572's distinct-heads/distinct-tails assignment becomes
  `tail_part = (device + episode) % P` by construction);
* negatives are drawn from the device's *current tail partition* only,
  matching the per-partition negative sampler rebuild of solver.h:1264-1278;
* episode rotation visits every (i, j) block once per P episodes.
"""
from graphvite_tpu.parallel.mesh import (
    VertexPartition, BlockEdgeTables, ShardedGraphTrainer, make_mesh,
)
from graphvite_tpu.parallel.kg import ReplicatedKGTrainer

__all__ = ["VertexPartition", "BlockEdgeTables", "ShardedGraphTrainer",
           "ReplicatedKGTrainer", "make_mesh"]
