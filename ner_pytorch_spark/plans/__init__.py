"""End-to-end pipeline plans, checkpointed tables, lineage + metrics."""
