"""Pipeline-plan layer: declarative multi-step materialization with
signature-based incremental skip (plans/pipeline.py)."""
