"""Engine function layer: cross-engine-deterministic numeric/text helpers."""
