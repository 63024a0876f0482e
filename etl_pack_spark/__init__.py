"""etl_pack_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
framework (``AntonYurchenko/etl-pack``): projected / range-filtered /
ordered table scans, a universal scalar type system, canonical row
hashing with incremental anti-join deduplication, and batch sinks —
rebuilt on the Spark DataFrame API so Catalyst/Tungsten own the physical
execution (pushdown, join strategy, codegen, shuffle), plus the
large-scale training-data-pipeline operators (near-duplicate detection,
similarity search, text analysis, multimodal columns) the reference's
scope points toward.

Design rules (enforced throughout):
  * DataFrame/SQL first — operators are declarative plans, never
    driver-side loops over collected rows.
  * Python UDFs only where built-ins genuinely cannot express the
    semantics, and then always Arrow-batched (pandas UDF / mapInPandas).
  * No driver-side state proportional to data size (the reference keeps
    its dedup hash-set in process memory, provider.go:161-179 — here it
    stays a DataFrame and Catalyst picks broadcast vs shuffle).
"""

__version__ = "0.1.0"

from etl_pack_spark.session import get_spark  # noqa: F401
