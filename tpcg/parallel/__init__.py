"""Multi-chip scale-out (SURVEY.md §5.7/§5.8 TPU equivalents):
knot-axis domain decomposition via shard_map (ppermute halos + psum
reductions) and embarrassingly-parallel batch sharding."""
