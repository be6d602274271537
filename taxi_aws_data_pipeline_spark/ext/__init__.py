"""Large-scale training-data extensions (driver mandate; BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
column plumbing. All operators are designed partition-parallel for the
100 TB posture and, where SQL-expressible, carry DuckDB oracle twins in
plans/ext_catalog.py."""
