"""Camera math, mesh/trajectory IO, metrics, checkpointing, profiling."""
