"""Deterministic synthetic fixtures (no wall-clock, no RNG state —
all content is a pure function of the row index)."""
