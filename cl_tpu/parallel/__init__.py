"""Parallelism beyond data-parallel: spatial sharding with halo exchange."""
