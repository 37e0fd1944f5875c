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


def sql(spark, sf_dir: str, query_text: str):
    """The reference's user surface in one call: register the corpus
    tables as temp views (``02.py:126-127`` pattern) and run SQL text.

    >>> engine.sql(spark, "/data/sf1", "SELECT count(*) FROM lineitem")
    """
    from .sources.tables import register_corpus

    register_corpus(spark, sf_dir)
    return spark.sql(query_text)


def run_query(key: str, spark, sf_dir: str):
    """Run a registered query key by name (see ``plans.queries()`` /
    SURVEY.md §8 for the full inventory)."""
    from . import plans

    return plans.queries()[key](spark, sf_dir)
