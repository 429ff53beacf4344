"""Structured Streaming operators (beyond the reference's batch-only
model): windowed rollups and stateful sessionization over the events
stream."""
