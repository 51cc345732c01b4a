"""Logical plans: end-to-end index build pipeline, lineage/checkpointing."""
