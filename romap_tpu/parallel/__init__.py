"""Device mesh + sharding of the object axis across TPU chips."""
