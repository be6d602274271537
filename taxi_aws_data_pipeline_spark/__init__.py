"""PySpark-native analytics engine with the capabilities of
AshfaqueAsim653/taxi-aws-data-pipeline (see SURVEY.md).

The reference is a single-node pandas batch-ETL pipeline; this package
re-expresses every one of its operators (SURVEY.md §2) as lazy Spark
DataFrame plans, plus the large-scale training-data extensions
(dedup / similarity search / text analysis / multimodal plumbing).

Layout (SURVEY.md §7.0):

- ``session``     tuned SparkSession builder (local testing + cluster posture)
- ``tables``      testdata readers (ns-timestamp drift handling)
- ``compat``      oracle-parity numeric helpers (decimal-exact money aggs)
- ``schema``      canonical taxi StructType + cast enforcement        (P1)
- ``sources``     batch file scans, listing ops, top-K, keep-newest   (S1-S6)
- ``quality``     cleaning suite C1-C10 in reference order            (§2.7)
- ``features``    derived-column block E1-E14 / P4 / P7               (§2.6)
- ``metrics``     the five aggregate metric families                  (A1-A6)
- ``sinks``       partitioned parquet / CSV / latest-alias writers    (S7-S9)
- ``pipeline``    composed batch lifecycle                            (§3)
- ``streaming``   incremental exactly-once ingestion                  (§2.9)
- ``ext``         dedup / similarity / text / multimodal extensions   (§7.1-8)
- ``plans``       the query catalog backing ``__spark_entry__``
"""

__version__ = "0.1.0"
