"""Operators: index build, BM25 scoring, segments, WAND, dedup, ANN."""
