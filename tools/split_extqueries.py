#!/usr/bin/env python3
"""One-shot mechanical split of queries/ExtQueries.scala into chained
per-family traits. Keeps every key and body line identical; only the
container changes (object -> trait chain) and top-level `private`
members become `protected` so later slices keep seeing earlier helpers.
Run once from the repo root; safe to delete afterwards."""
import re

SRC = "src/main/scala/graft/queries/ExtQueries.scala"
lines = open(SRC).read().split("\n")  # 0-based

# 1-based inclusive slice starts (section-comment lines), chosen at
# gate boundaries so helper clusters stay with their first user.
slices = [
    ("ExtFoundations",      "x01-x31, x55, x57: exact/near dedup, text profiling, ANN, event windows, the incremental-day funnel + shared proto-store infra", 24,   1003),
    ("ExtStreamSample",     "x32-x64: quality gates, streaming drains, sampling, corpus funnels, mixture plans", 1004, 2092),
    ("ExtCorpusStats",      "x65-x100: daily dedup store, graph centrality, retrieval, SCD2 history, quality models, BPE merges", 2093, 3268),
    ("ExtSketchStores",     "x101-x137: time travel, sketch stores (CM/hist), PQ ANN, expectations, streaming stores", 3269, 4625),
    ("ExtVectorStores",     "x138-x162: HLL/KMV stores, recall audits, trained codebooks, index stores, drift", 4626, 5987),
    ("ExtSkipIndexes",      "x163-x187: zone/bloom/token skipping indexes, forgets, hh store, view stores, graph expansion", 5988, 7116),
    ("ExtLmStores",         "x188-x216: SCD2 store, sample/moment/vocab/LM stores, zipf/heaps, rebuild/repair", 7117, 8439),
    ("ExtErasureCompaction","x217-x241: composed erasure, media store, bench registry, epoch compaction rollout", 8440, 9709),
]

header = """package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, Chunking, DataCard, Dedup, Dsir, Events, Graph, LangModel, MediaStore, Multimodal, Pq, Privacy, Profiling, Quantiles, Redaction, Retrieval, SampleStore, Sampling, Scd2, Sharding, Similarity, Sketches, TextAnalysis}
"""

priv = re.compile(r"^(  )private(\s+(def|val|lazy val|object)\b)")

prev = None
for name, desc, lo, hi in slices:
    body = lines[lo - 1 : hi]  # 1-based inclusive -> 0-based slice
    body = [priv.sub(r"\1protected\2", l) for l in body]
    ext = f" extends {prev}" if prev else ""
    out = (
        header
        + f"\n/** {desc}.\n  * Mechanical slice of the former single-object ExtQueries (r14);\n  * see ExtQueries.scala for the shared determinism conventions.\n  */\nprivate[graft] trait {name}{ext} {{\n"
        + "  import CoreQueries.t\n" + "\n".join(body)
        + "\n}\n"
    )
    open(f"src/main/scala/graft/queries/{name}.scala", "w").write(out)
    prev = name

# Rewrite ExtQueries.scala as the thin composed object, preserving the doc.
doc = "\n".join(lines[0:22])  # package + imports + scaladoc
open(SRC, "w").write(doc + f"\nobject ExtQueries extends {prev}\n")
print("split done")
