"""Offline runner and online manager (NerfManagerOnline-shaped API)."""
