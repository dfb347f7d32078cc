"""Data pipeline: clip datasets, host-side decode, prefetching loaders."""
