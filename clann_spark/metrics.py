"""Run/Query/Cluster-granularity counters (reference parity:
result_schema.sql build/search metrics tables, the per-query
distance-computation counter performance.hpp:72-80 and its FFI
surface puffinn.rs:133-141, metric appends src/utils/metrics/
mod.rs:84-113, CSV sink src/utils/metrics/csv.rs:1-20).

Spark rendering:
  * DataFrame-side counts -> Observation rows attached to the plan
    (collected when the stage's action runs — no extra jobs);
  * Python-UDF-side work -> SparkContext accumulators incremented
    inside the vectorized UDFs (the only places Python touches rows);
  * persistence -> the StageRunner lineage JSON (counters per stage)
    and an optional CSV sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CounterSet:
    """Named Spark accumulators for UDF-side work counters.

    acc('center_dist_computations') etc. Read with totals() on the
    driver after actions complete — the A8 distance-computation counter
    generalized to any hot-path UDF."""

    spark: SparkSession
    _accs: dict = field(default_factory=dict)

    def acc(self, name: str):
        if name not in self._accs:
            self._accs[name] = self.spark.sparkContext.accumulator(0)
        return self._accs[name]

    def totals(self) -> dict[str, int]:
        return {k: int(v.value) for k, v in self._accs.items()}


def attach_query_metrics(out, probe1, scored1, scored2) -> DataFrame:
    """Per-QUERY search metrics (result_schema.sql:32-75
    `search_metrics_query`; the per-query read-back of the
    performance.hpp:72-80 counters via puffinn.rs:133-141).

    Builds a lazy per-query counters DataFrame from the probe/scoring
    joins of an IVF search — n_probes (partitions probed round 1),
    n_candidates (round-1 distance computations), n_rescued (rescue
    round computations), n_comparisons (total) — and attaches it to the
    result; read it with query_metrics(result). Computed only if the
    caller materializes it (the aggregations share scored1's persisted
    blocks). Persist alongside stage counters via
    StageRunner.stage('query_metrics', lambda: query_metrics(result)).
    """
    from pyspark.sql import functions as F

    qm = probe1.select("query_id", F.size("pids").alias("n_probes"))
    c1 = scored1.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    qm = qm.join(c1, "query_id", "left")
    if scored2 is not None:
        c2 = scored2.groupBy("query_id").agg(F.count("*").alias("n_rescued"))
        qm = qm.join(c2, "query_id", "left")
    else:
        qm = qm.withColumn("n_rescued", F.lit(None).cast("long"))
    qm = qm.select(
        "query_id",
        "n_probes",
        F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        F.coalesce("n_rescued", F.lit(0)).alias("n_rescued"),
        (F.coalesce("n_candidates", F.lit(0)) + F.coalesce("n_rescued", F.lit(0))).alias(
            "n_comparisons"
        ),
    )
    out._clann_query_metrics = qm
    return out


def query_metrics(result_df: DataFrame) -> DataFrame | None:
    """The per-query counters DataFrame attached by an IVF/LSH search
    (None if the producing operator doesn't emit them)."""
    return getattr(result_df, "_clann_query_metrics", None)


def attach_cluster_metrics(out, probe1_x, rescue_df, assigned) -> DataFrame:
    """Per-CLUSTER search metrics (`search_metrics_cluster` parity,
    result_schema.sql:77+): one row per corpus partition — points held,
    queries that probed it in round 1 / the rescue round, and the probe
    join's candidate rows contributed (n_queries * n_points, counted
    before the self-pair filter). Lazy; persist beside the per-query
    rows via StageRunner.stage('cluster_metrics', ...)."""
    from pyspark.sql import functions as F

    pts = assigned.groupBy("partition_id").agg(F.count("*").alias("n_points"))
    p1 = probe1_x.groupBy("partition_id").agg(F.count("*").alias("n_queries_probe"))
    cm = pts.join(p1, "partition_id", "left")
    if rescue_df is not None:
        p2 = rescue_df.groupBy("partition_id").agg(
            F.count("*").alias("n_queries_rescue")
        )
        cm = cm.join(p2, "partition_id", "left")
    else:
        cm = cm.withColumn("n_queries_rescue", F.lit(None).cast("long"))
    cm = cm.select(
        "partition_id",
        "n_points",
        F.coalesce("n_queries_probe", F.lit(0)).alias("n_queries_probe"),
        F.coalesce("n_queries_rescue", F.lit(0)).alias("n_queries_rescue"),
        (
            (
                F.coalesce("n_queries_probe", F.lit(0))
                + F.coalesce("n_queries_rescue", F.lit(0))
            )
            * F.col("n_points")
        ).alias("n_candidates"),
    )
    out._clann_cluster_metrics = cm
    return out


def cluster_metrics(result_df: DataFrame) -> DataFrame | None:
    """The per-cluster counters DataFrame attached by an IVF search."""
    return getattr(result_df, "_clann_cluster_metrics", None)


def verify_observation(result_df):
    """The verify-stage Observation attached by lsh_text_query /
    checkpointed runs: run-level `comparisons` (exact Jaccard
    evaluations) and `pairs_verified` totals, collected by the plan's
    own action (A8, performance.hpp:72-80)."""
    return getattr(result_df, "_clann_verify_observation", None)


def metrics_rollup(metrics_df: DataFrame) -> DataFrame:
    """A5 build-metrics rollup (src/utils/metrics/mod.rs:152-185
    analog): per-run totals — stages, rows, wall, summed counters."""
    from pyspark.sql import functions as F

    return metrics_df.groupBy("run_id").agg(
        F.count("*").alias("n_stages"),
        F.sum("rows").alias("total_rows"),
        F.sum("wall_ms").alias("total_wall_ms"),
        F.sum(F.coalesce(F.element_at("counters", "comparisons"), F.lit(0))).alias(
            "comparisons"
        ),
        F.sum(F.coalesce(F.element_at("counters", "pairs_verified"), F.lit(0))).alias(
            "pairs_verified"
        ),
    )


def write_metrics_csv(metrics_df: DataFrame, path: str) -> None:
    """S6 CSV metrics sink (csv.rs:1-20 analog): one small header-ed
    CSV of the per-stage lineage/counter rows."""
    metrics_df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
