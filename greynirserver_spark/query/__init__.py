"""Query-surface layer: the reference's query dispatch re-expressed."""
