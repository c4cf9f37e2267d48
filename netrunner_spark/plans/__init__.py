"""Query lifecycle plans mirroring the reference entry points (§3)."""
