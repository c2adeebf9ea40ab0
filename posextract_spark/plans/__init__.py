"""Orchestration plans: lineage manifests + checkpoint-resumable runs."""
