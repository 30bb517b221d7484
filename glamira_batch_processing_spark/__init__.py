"""glamira_batch_processing_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference batch pipeline (Tramnddle/Glamira-Batch-Processing): a
layered ETL warehouse (raw -> staging -> intermediate QA -> SCD2
snapshots -> star-schema marts -> audit metrics) re-expressed as
idiomatic Spark DataFrame / SQL transforms, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design rules (see SURVEY.md §7):
- DataFrame / Column expressions only in hot paths (whole-stage codegen);
  pandas UDFs only where built-ins can't express the semantics.
- Broadcast small dims, AQE on, explicit partitioning on writes.
- Every operator has a DuckDB-oracle-checkable query in
  ``__spark_entry__.py``.
"""

__version__ = "0.1.0"

from .session import get_spark

__all__ = ["get_spark", "__version__"]
