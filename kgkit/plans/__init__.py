"""Stage registry: checkpoint-resumable stages + per-partition lineage."""
