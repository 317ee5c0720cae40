from fugue_warehouses_spark.plans.checkpoint import (
    plan_fingerprint,
    deterministic_checkpoint,
    yield_table_as,
)

__all__ = ["plan_fingerprint", "deterministic_checkpoint", "yield_table_as"]
