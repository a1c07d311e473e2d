#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: end-to-end near-duplicate detection over documents.parquet at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]: signatures -> band buckets -> candidate pairs
-> exact verify -> connected components -> summary.

Extra modes:
  SPARK_GRAFT_SCALING=1  also run the identical job in two fresh
      subprocesses at N and 4N cores (local[2] vs local[8], the
      sandbox stand-in for N vs 4N executors per BASELINE.md) and
      report throughputs + scaling efficiency (T_n/T_4n)/4.
  (internal) --one-run MASTER  run one e2e pass and print seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _e2e(spark, docs, cfg, pair_mode="auto"):
    from clann_spark.pipeline import dedup_summary, run_dedup

    res = run_dedup(docs, cfg, pair_mode=pair_mode)
    row = dedup_summary(res).collect()[0]
    # unpersist EVERY intermediate: Spark's CacheManager matches
    # semantically-equal plans, so a leftover cache would make a
    # repeated timing run read caches instead of executing
    res.signatures.unpersist()
    res.candidates.unpersist()
    res.verified.unpersist()
    return row


def _scaled_docs(spark, factor: int):
    """Deterministically expand documents x factor for the scaling runs.

    Each replica mutates a rep-dependent 1-in-7 word stride (appending
    the rep id), which breaks ~5/7 of the 5-word shingles: replicas of
    the same doc sit well below tau, so the dup structure stays
    realistic instead of exploding into factor-sized exact-dup cliques.
    The expansion is a pure function of (doc_id, rep) — identical input
    for both parallelism levels, as the scaling protocol requires.
    """
    from pyspark.sql import functions as F

    # repartition BEFORE the expansion: the single-file parquet arrives
    # as 1 partition and would otherwise serialize generation + persist
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .repartition(max(64, spark.sparkContext.defaultParallelism * 2))
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(split(text, ' '), "
            "(w, i) -> IF(i % 7 = rep % 7, concat(w, '_', rep), w)))"
        ).alias("text"),
    )


def _warn_if_thp_active() -> None:
    """Transparent hugepages make wall clocks on this class of VM swing
    2-3x between identical runs (khugepaged/kcompactd stalls — measured
    in rounds 1 and 3, BASELINE.md). The scaling protocol requires
    `echo never > /sys/kernel/mm/transparent_hugepage/enabled`; warn on
    stderr (not stdout — the driver parses stdout as JSON) if it is on."""
    try:
        with open("/sys/kernel/mm/transparent_hugepage/enabled") as f:
            if "[never]" not in f.read():
                print(
                    "WARNING: transparent hugepages enabled — timings will be "
                    "noisy (see BASELINE.md scaling protocol)",
                    file=sys.stderr,
                )
    except OSError:
        pass


def one_run(master: str, factor: int) -> float:
    """End-to-end run (JIT-warmed) used by the scaling comparison."""
    from clann_spark.config import DedupConfig
    from clann_spark.session import get_spark

    spark = get_spark("bench-one", master=master)
    # hamming_prefilter defaults to 'auto' (planner threshold) — the
    # prod J7 path, same as the reference's always-on sketch filter
    cfg = DedupConfig(signature_impl="fast")
    docs = _scaled_docs(spark, factor).persist()
    docs.count()  # materialize the input so we time the pipeline, not gen
    if os.environ.get("SPARK_GRAFT_WARM") == "1":
        # warm protocol: one full untimed pass first — JVM JIT + shuffle
        # machinery amortize on a long-running cluster; the timed second
        # pass is the steady-state throughput. clearCache() drops every
        # intermediate cache (CacheManager would otherwise serve
        # semantically-equal plans from memory); only the input is
        # re-materialized before timing.
        _e2e(spark, docs, cfg)
        spark.catalog.clearCache()
        docs = docs.persist()
        docs.count()
    else:
        _e2e(spark, docs.limit(500), cfg)  # JIT/codegen warmup (cheap)
    t0 = time.time()
    _e2e(spark, docs, cfg)
    dt = time.time() - t0
    spark.stop()
    return dt


def main() -> None:
    from clann_spark.config import DedupConfig
    from clann_spark.session import get_spark

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    _warn_if_thp_active()
    spark = get_spark("bench", master=f"local[{CPUS}]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()

    queries: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        queries[name] = round(time.time() - t0, 3)

    # S7 config source: an optional JSON config file overrides the
    # default prod config (reference: benches/configs.json)
    cfg_file = os.environ.get("SPARK_GRAFT_CONFIG")
    if cfg_file:
        from clann_spark.config import load_configs_from_file

        cfg_fast = load_configs_from_file(cfg_file)[0]
    else:
        # J7 prefilter rides on the 'auto' default (planner threshold)
        cfg_fast = DedupConfig(signature_impl="fast")
    # md5 expr path (the correctness-gate config; prefilter opted out)
    cfg_oracle = DedupConfig(hamming_prefilter=None)

    from clann_spark.entry_queries import q_knn_cosine_top5
    from clann_spark.operators.candidates import candidate_pairs
    from clann_spark.operators.signatures import compute_signatures, explode_bands
    from clann_spark.operators.verify import verify_pairs

    # warmup: one untimed pass on a slice so JIT/codegen/Arrow init and
    # shuffle-service warmth don't land on the first timed query
    _e2e(spark, docs.limit(500), cfg_fast)

    timed("e2e_dedup", lambda: _e2e(spark, docs, cfg_fast))
    timed("e2e_dedup_md5", lambda: _e2e(spark, docs, cfg_oracle))

    sigs = compute_signatures(docs, cfg_fast, drop_text=True).persist()
    timed("signatures", lambda: sigs.count())
    cands = candidate_pairs(explode_bands(sigs, cfg_fast), cfg_fast, "auto")
    timed("candidates_verify", lambda: verify_pairs(cands, sigs, cfg_fast).count())
    timed("knn_cosine_top5", lambda: q_knn_cosine_top5(spark, SF_DIR).count())

    from clann_spark.operators.embedding_lsh import embedding_lsh_pairs
    from clann_spark.operators.simhash_dedup import simhash_near_pairs

    timed(
        "simhash_pairs",
        lambda: simhash_near_pairs(
            sigs.select("doc_id", "simhash"), max_hamming=4
        ).count(),
    )
    # production near-dup regime (tau=0.9): the planner provisions a
    # selective plan (the gate query's tau=0.4 setting is the
    # degenerate everything-collides regime by design — see its
    # docstring — and would benchmark brute force, not LSH)
    from clann_spark.planner import plan_hyperplane_banding

    eplan = plan_hyperplane_banding(0.9, target_recall=0.999, max_bits=1024)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed(
        "embedding_lsh_pairs",
        lambda: embedding_lsh_pairs(
            emb, tau=0.9, bands=eplan.bands, rows_per_band=eplan.rows_per_band,
            verify_impl="fast",
        ).count(),
    )
    sigs.unpersist()
    spark.stop()

    out = {
        "metric": "e2e dedup wall seconds (fast prod config) at sf; "
        "docs_per_sec + scaling in extras",
        "value": queries["e2e_dedup"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / queries["e2e_dedup"], 1),
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "400"))
        n_scaled = n_docs * factor
        scaling = {"n_docs": n_scaled, "scale_factor": factor}
        # N vs 4N EXECUTOR CORES: 1 worker JVM x 2 cores vs 4 worker
        # JVMs x 2 cores (local-cluster = separate executor JVMs with
        # their own heaps — the sandbox's closest stand-in for N vs 4N
        # executors; see BASELINE.md). Override with
        # SPARK_GRAFT_SCALING_MASTERS="masterN;master4N".
        masters = os.environ.get(
            "SPARK_GRAFT_SCALING_MASTERS",
            "local-cluster[1,2,8192];local-cluster[4,2,8192]",
        ).split(";")
        # warm (steady-state) discipline by default: each level times
        # the second full pass after clearCache — cold-JIT constants
        # otherwise dominate the 4N level (BASELINE.md)
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_WARM", "1")
        scaling["discipline"] = "warm" if env["SPARK_GRAFT_WARM"] == "1" else "cold"
        # This VM's wall clocks swing 2-3x with host tenancy (see
        # BASELINE.md): run the two levels in ALTERNATING reps and take
        # the min per level, so a noise window hits both levels rather
        # than aliasing as a scaling difference.
        reps = int(env.get("SPARK_GRAFT_SCALING_REPS", "2"))
        runs: dict[str, list[float]] = {"t_n": [], "t_4n": []}
        for _ in range(reps):
            for master, key in ((masters[0], "t_n"), (masters[1], "t_4n")):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one-run", master, str(factor)],
                    capture_output=True, text=True, env=env,
                )
                runs[key].append(float(p.stdout.strip().splitlines()[-1]))
        scaling["t_n"] = min(runs["t_n"])
        scaling["t_4n"] = min(runs["t_4n"])
        scaling["reps"] = runs
        scaling["masters"] = masters
        scaling["efficiency_n_to_4n"] = round(scaling["t_n"] / scaling["t_4n"] / 4.0, 3)
        scaling["docs_per_sec_n"] = round(n_scaled / scaling["t_n"], 1)
        scaling["docs_per_sec_4n"] = round(n_scaled / scaling["t_4n"], 1)
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one-run":
        print(one_run(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 20))
    else:
        main()
