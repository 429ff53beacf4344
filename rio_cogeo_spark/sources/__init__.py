"""Sources/sinks: pages tables, checkpointed pyramid writes (S1-S7)."""
