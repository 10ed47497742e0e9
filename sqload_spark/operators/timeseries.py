"""Time-series operators over `events` (windows, sessionization, as-of join)."""
