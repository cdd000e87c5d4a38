"""Cross-cutting utilities (structured logging, seeding)."""
