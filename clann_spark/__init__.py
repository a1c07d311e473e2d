"""clann_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine with the query/data-processing capabilities of the
reference `enricobolzonello/clann` (clustered PUFFINN LSH), re-expressed
Spark-first for web-scale (10^12-document) dedup.

Reference semantics covered (see SURVEY.md §2 for the full inventory):
  - MinHash / banding LSH candidate generation
    (ref: libpuffinn/include/puffinn/hash/minhash.hpp:97-127,
     hash_source/independent.hpp:19-86, collection.hpp:390-504)
  - SimHash fingerprints + Hamming prefilter
    (ref: libpuffinn/include/puffinn/hash/simhash.hpp:41-45,
     filterer.hpp:16-32)
  - Gonzalez k-center coarse partitioning (ref: src/core/gmm.rs:21-63)
  - Exact verification + pair canonicalization
    (ref: libpuffinn/include/puffinn/maxpairbuffer.hpp:64-80)
  - Connected components (target-only, per BASELINE.json north_rule)
  - Suffix-array exact long-substring pass (target-only, north_rule)

Everything heavy is either pure Spark SQL expressions (JVM, whole-stage
codegen) or vectorized Arrow/pandas UDFs — no per-row Python.
"""

__version__ = "0.1.0"

from clann_spark.config import DedupConfig  # noqa: F401
