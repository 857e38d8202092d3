"""L1 — data layer: task splits, datasets, host pipeline, prefetch."""
