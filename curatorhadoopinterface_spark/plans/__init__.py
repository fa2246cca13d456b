"""Pipeline planning: annotation-mode DAG, provide() planner,
incremental record store."""
