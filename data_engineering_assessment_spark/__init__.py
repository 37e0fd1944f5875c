"""PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of ``manselmi/data-engineering-assessment`` (see
``SURVEY.md``), widened with the standard relational operator set and
LLM-training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Design principles (SURVEY.md §7):

- DataFrame / SQL declarative plans; Catalyst + Tungsten pick the
  physical strategy.  No RDDs in the hot path.
- Explicit schemas everywhere — never inference.
- Generated native ``Column`` expressions instead of Python UDFs
  (mirroring the reference's SQL-codegen philosophy, ``02.py:17-103``).
- Pandas UDFs (Arrow-batched) only where no native expression exists.
- Every operator designed for 100 TB: broadcast small dims, shuffle on
  explicit keys, inverted-index / LSH instead of cross joins.
"""

__version__ = "0.1.0"
