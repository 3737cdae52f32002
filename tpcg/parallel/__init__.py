"""Multi-chip scale-out (SURVEY.md §5.7/§5.8 TPU equivalents):
knot-axis domain decomposition via shard_map (ppermute halos + psum
reductions) and embarrassingly-parallel batch sharding."""

from tpcg.parallel.knot_sharded import (pcg_knot_sharded,
                                        pcg_knot_sharded_batched,
                                        pcg_solve_sharded)
from tpcg.parallel.batch_sharded import pcg_solve_batch_sharded

