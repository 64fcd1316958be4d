package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, Chunking, DataCard, Dedup, Dsir, Events, Graph, LangModel, MediaStore, Multimodal, Pq, Privacy, Profiling, Quantiles, Redaction, Retrieval, SampleStore, Sampling, Scd2, Sharding, Similarity, Sketches, TextAnalysis}

/** Extension-surface queries (SURVEY.md §2.12): dedup, similarity search,
  * text analysis, event-time windows, multimodal plumbing — each with a
  * DuckDB oracle unless the op is inherently approximate (x06/x11: the
  * blocking key depends on xxhash64, which DuckDB can't replicate — those
  * get rows-only checks).
  *
  * Determinism conventions shared with the oracles:
  *  - ratios are single divisions of exactly-computed integer counts
  *    (bit-identical across engines);
  *  - cosines are rounded to 6 dp AFTER identical-order double arithmetic;
  *  - event-time math runs on exact integer MICROSECONDS, resolved from
  *    the fixture's actual parquet encoding by [[graft.ext.Events
  *    .epochMicros]] (LONG nanos via the `nanosAsLong=true` compat read,
  *    or native TIMESTAMP(MICROS) — parquet's default); DuckDB oracles use
  *    the type-agnostic `epoch_us(ts)` and agree on either encoding.
  */
object ExtQueries extends ExtErasureCompaction
