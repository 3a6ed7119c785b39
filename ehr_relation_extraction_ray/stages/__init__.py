"""Ray Data stages: each maps a Dataset of one logical table to the next."""
