"""Sources/sinks: pages store maintenance (upsert, dedup, link
extraction) and WARC/WET container ingestion + export (warc.py)."""
