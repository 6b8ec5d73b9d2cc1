"""epstein_browser_spark — a from-scratch PySpark-native reimplementation of
the document-extraction core of ``actuallyrizzn/epstein-browser``.

The reference is a Flask + SQLite single-process OCR browser; this package
re-expresses its extraction semantics (span/confidence filtering, quality
heuristics, idempotent content indexing, stable-order navigation, search)
as a distributed batch pipeline over a ``transcripts`` table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` using the PySpark DataFrame API and vectorized pandas/Arrow
UDFs only — no per-row Python in the hot path.

Layout:
  core/       pure pandas/python extraction + quality kernels (no Spark)
  udfs.py     pandas-UDF / mapInPandas wrappers around core
  pipeline.py partition-aware extraction driver: repartition on
              hash(conv_id), skew salting, per-partition checkpoint
              manifests + lineage + metrics, resumable, idempotent writes
  ordering.py stable (conv_id, turn_idx) navigation windows (W1-W5)
  queries.py  relational query surface (stats/search/analytics) with
              DuckDB-oracle-checkable SQL equivalents
  dedup.py    exact / minhash-LSH / simhash / n-gram-jaccard dedup +
              dup-cluster resolution (connected components)
  similarity.py  embedding ANN: brute-force cosine top-k, LSH buckets +
              multi-probe, IVF cells + nprobe, PQ codes/ADC, composed
              IVF-PQ
  textstats.py   language-id, quality scoring, token counts, fingerprints,
              deterministic splits, decontamination, vocabulary census
  redaction.py   PII redaction (email/SSN/IP/phone), URL/domain census,
              C4/Gopher document-quality rules
  curation.py    the composed end-to-end curation job: extract → dedup
              keep-policy → stats/langid → split → manifests (resumable);
              incremental ingest against the persisted minhash/band index
              (run_curation_increment) + snapshot vacuum
  multimodal.py  binary-column plumbing + frame sampling (decode stubbed)
  joins.py    temporal joins Spark lacks as built-ins: as-of join (window
              merge-scan, zero joins) and bin-bucketed range join
  merge.py    content-hash merge classification + the real per-bucket
              merge/upsert sinks (dynamic partition overwrite)
  streaming.py   checkpointed streaming variant + stateful per-conversation
              progress (applyInPandasWithState)
  fsutil.py   Hadoop-FS small-file I/O (manifests work on hdfs://s3a://)
  sketches.py bounded-state summaries: HyperLogLog distinct census,
              count-min heavy hitters, Bloom-filter semi-join positions,
              grid-pruned 2-D Pareto skyline (all md5-deterministic,
              DuckDB-value-oracled)
  graph.py    link-graph + hierarchy kernels: integer PageRank, triangle
              census (degree orientation), recursive tree closure
              (pointer doubling — the WITH RECURSIVE equivalent)
  bpe.py      corpus-trained byte-pair encoding (train: one shuffle +
              bounded driver merges; apply: JVM literal-replace chain)
  convstats.py   agent-transcript analytics (role flows, tool census,
              SFT pairs, conversation packing)
  synth.py    deterministic synthetic transcripts generator (seed=42)
"""

__version__ = "0.1.0"
