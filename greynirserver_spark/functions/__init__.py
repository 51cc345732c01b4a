"""Scalar/text function families: language ID, quality heuristics."""
