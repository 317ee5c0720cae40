"""Deterministic, content-addressed checkpoints (Fugue contract B16).

The reference's workflow DAG derives a stable ``spec_uuid`` per node so
``deterministic_checkpoint(storage_type="table")`` reuses the
materialized table across runs and across DAGs (``yield_table_as``,
tests/fugue_bigquery/test_workflow.py:35-64). Here the identity is a
hash of Spark's *canonicalized analyzed plan* — two frames built by
different code paths but describing the same computation share a
fingerprint, so re-running a pipeline skips recomputation.

Storage is plain parquet under a checkpoint root (durable — survives
session restart, unlike ``df.cache()``), registered as a temp view for
catalog lookup. At cluster scale the root would be an object-store
path; identity and layout are unchanged.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def plan_fingerprint(df: DataFrame) -> str:
    """Stable hex id for the frame's logical plan.

    Uses the canonicalized analyzed plan (expression ids normalized
    away) so logically-identical plans hash equal across sessions built
    from the same inputs.
    """
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def _checkpoint_root(spark: SparkSession) -> str:
    root = spark.conf.get(
        "spark.fugue_warehouses.checkpoint.dir",
        os.path.join(os.environ.get("SPARK_GRAFT_TMP", "/tmp"), "wf_checkpoints"),
    )
    return root


def deterministic_checkpoint(
    df: DataFrame, spark: SparkSession | None = None, namespace: str = ""
) -> DataFrame:
    """Materialize ``df`` once per logical plan; reuse on later calls.

    Returns a frame re-rooted at the materialized parquet (like the
    reference's persist-to-temp-table re-rooting,
    fugue_bigquery/execution_engine.py:126-141, but durable and
    content-addressed).
    """
    spark = spark or df.sparkSession
    fid = plan_fingerprint(df)
    if namespace:
        fid = hashlib.sha256(f"{namespace}:{fid}".encode()).hexdigest()[:16]
    path = os.path.join(_checkpoint_root(spark), f"ckpt_{fid}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def yield_table_as(df: DataFrame, name: str, spark: SparkSession | None = None) -> None:
    """Hand a materialized result to other pipelines by name (B16).

    ``saveAsTable`` writes into the session warehouse and registers the
    name in the catalog, so a *different* pipeline (or session sharing
    the warehouse dir) can ``spark.table(name)`` it — the Spark shape of
    the reference's cross-DAG ``yield_table_as``.
    """
    spark = spark or df.sparkSession
    df.write.mode("overwrite").saveAsTable(name)
