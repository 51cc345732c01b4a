"""Sources/sinks: pages store maintenance (upsert, dedup, link extraction)."""
