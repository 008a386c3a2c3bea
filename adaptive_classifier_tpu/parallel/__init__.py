"""Multi-chip sharding: mesh construction and sharded kNN/training."""
