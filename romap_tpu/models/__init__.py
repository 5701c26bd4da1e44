"""Batched multi-object NeRF model and train/render steps."""
