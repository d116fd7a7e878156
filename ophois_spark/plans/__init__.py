"""Snapshot/lineage/resume layer."""
