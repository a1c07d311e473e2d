#!/usr/bin/env python
"""Deployment entry point for `spark-submit --py-files` (the north-rule
launch mode: `spark-submit --master <cluster> --py-files clann_spark.zip
examples/submit_dedup.py <sf_dir>`).

Deliberately imports clann_spark ONLY from what --py-files shipped (no
sys.path fixup): when launched by spark-submit, the zip is placed on
both the driver's and every executor's PYTHONPATH by Spark itself, so a
successful run is evidence that the packaged artifact is complete and
self-contained. Prints ONE JSON line with the dedup summary.

Usage:
    spark-submit --master local-cluster[2,2,2048] \
        --py-files clann_spark.zip examples/submit_dedup.py \
        /root/testdata/sf0.001

tests/test_submit.py builds the zip and runs exactly this command.
"""

import json
import sys

from pyspark.sql import SparkSession

from clann_spark.config import DedupConfig
from clann_spark.pipeline import dedup_summary, run_dedup


def main(sf_dir: str) -> None:
    # spark-submit owns master/deploy config — just get the session.
    spark = SparkSession.builder.appName("clann-submit-dedup").getOrCreate()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    res = run_dedup(docs, DedupConfig(signature_impl="fast"))
    row = dedup_summary(res).collect()[0]
    print(json.dumps({"summary": row.asDict()}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
