"""Training-data shaping keys: sharding, quality binning, corpus
mixing, and sequence packing — the steps between a cleaned corpus and
actual trainer input.

All outputs follow the fixed-point BIGINT/STRING contract (no
DECIMAL/derived-DOUBLE columns) so the driver's value hash is
engine-portable, and all hash predicates use the md5-prefix pattern
(proven portable by the sample_* keys): deterministic on any engine,
any partitioning, any cluster — reproducibility is the point of doing
these inside the engine rather than in a driver script.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import uniq_word_count, word_count
from ..session import ensure_deterministic_session
from ..sources.tables import load_table
from .registry import query


def _md5_prefix(col: str, n: int) -> F.Column:
    return F.md5(F.col(col).cast("string").cast("binary")).substr(1, n)


@query(
    "shard_assign",
    oracle="""
    SELECT left(md5(CAST(doc_id AS VARCHAR)), 1) AS shard,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY shard
    """,
)
def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way output sharding (md5 nibble of doc_id) with
    per-shard balance stats.

    Writing trainer shards by content hash — instead of Spark's
    partition index — makes shard membership a pure function of the
    data: re-runs, engine swaps, and incremental appends land every
    doc in the same shard, and the nibble keys are uniform so shard
    sizes stay balanced (the stats emitted here are the check).
    Scale: shuffle-free scan + a 16-group map-side-combined agg."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(_md5_prefix("doc_id", 1).alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "quality_bins",
    oracle="""
    WITH s AS (
      SELECT len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
      WHERE len(string_split(text, ' ')) >= 1
    )
    SELECT CAST(LEAST(9, FLOOR(CAST(n_uniq AS DOUBLE) / n_words * 10)) AS INT) AS bin,
           count(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM s GROUP BY bin
    """,
)
def quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity decile binning (floor(uniq/words * 10),
    top clamped) with per-bin volume — the histogram a curriculum or
    quality-resampling stage reads before choosing per-bin rates.

    The bin edge is a single IEEE divide+multiply on identical integer
    operands in both engines, so bucket boundaries cannot disagree.
    Scale: scan-speed narrow projection + a ≤10-group agg."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents").filter(word_count("text") >= 1)
    ratio = uniq_word_count("text").cast("double") / word_count("text")
    bin_ = F.least(F.lit(9), F.floor(ratio * 10)).cast("int")
    return (
        d.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(word_count("text")).cast("long").alias("total_words"),
        )
    )


@query(
    "corpus_mix",
    oracle="""
    SELECT doc_id, source, lang FROM documents
    WHERE source IN ('src0', 'src1', 'src2')
       OR left(md5(CAST(doc_id AS VARCHAR)), 2) <= '3f'
    """,
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-weighted corpus mixture: premium sources
    kept whole, the long tail downsampled to ~25% by content hash —
    the standard rebalancing move when one crawl dominates the corpus.

    Same md5-prefix predicate as the sample_* keys: membership is a
    pure function of (doc_id, source), so the mixture is reproducible
    and joinable across runs.  Scale: one scan-speed filter, no
    shuffle, no RNG state."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents")
    premium = F.col("source").isin("src0", "src1", "src2")
    return d.filter(premium | (_md5_prefix("doc_id", 2) <= "3f")).select(
        "doc_id", "source", "lang"
    )


@query(
    "seq_pack_chunks",
    oracle="""
    WITH t AS (
      SELECT left(md5(CAST(doc_id AS VARCHAR)), 1) AS shard, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), o AS (
      SELECT shard, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM t
    )
    SELECT shard, CAST(off // 1024 AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM o GROUP BY shard, pack_id
    """,
)
def seq_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per shard, docs concatenate
    in deterministic (doc_id) order and split into 1024-token chunks;
    a doc belongs to the pack where its first token lands.  This is
    the packing LLM pretraining actually uses (concatenate, then cut
    fixed windows) — unlike greedy bin packing it needs only a
    prefix sum, so it stays a window expression instead of stateful
    Python.

    Scale: one shuffle on the shard key; each shard packs
    independently (embarrassingly parallel across shards), and the
    running offset is a single sorted window pass per shard."""
    ensure_deterministic_session(spark)
    d = load_table(spark, sf_dir, "documents").select(
        _md5_prefix("doc_id", 1).alias("shard"),
        "doc_id",
        word_count("text").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        d.withColumn("pack_id", F.floor(off / 1024).cast("long"))
        .groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("pack_tokens"),
        )
    )
