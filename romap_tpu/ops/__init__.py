"""Compute primitives: geometry, encoding, MLP, rendering, marching cubes."""
