"""End-to-end curation job: dedup correctness, split hygiene, manifests,
stage-level idempotent resume (VERDICT r2 item 5)."""

import glob
import json
import os

import pandas as pd
from pyspark.sql import functions as F

from epstein_browser_spark import curation


def _file_mtimes(root):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{root}/**/*.parquet", recursive=True)
    }


def test_curation_end_to_end(spark, corpus_sdf, tmp_path):
    # inject cross-conversation EXACT duplicates of quality-passing turns so
    # the exact-dedup stage has real work (the fixture's own dup texts are
    # noise payloads that the quality gate removes first)
    dups = (
        corpus_sdf.filter(F.length("text") > 80).limit(10)
        .withColumn("conv_id", F.concat(F.lit("dup_"), F.col("conv_id")))
    )
    src = corpus_sdf.unionByName(dups)
    out = str(tmp_path / "curated_job")
    m1 = curation.run_curation(spark, src, out, n_buckets=8,
                               input_snapshot="snap1")
    assert m1["extract"]["rows_out"] > 0
    n_curated = m1["curate"]["n_docs"]
    assert n_curated > 0

    cur = curation.read_curated(spark, out)
    assert cur.count() == n_curated

    # quality gate: nothing low-quality or parse-failed survives
    assert cur.filter(F.col("is_low_quality") | F.col("parse_failed")).count() == 0

    # exact dedup: content hashes are globally unique in the output
    dup_hashes = (
        cur.groupBy("content_hash").count().filter(F.col("count") > 1).count()
    )
    assert dup_hashes == 0
    # ... and the synthetic corpus really contained cross-doc exact dups
    # (otherwise this test proves nothing)
    pre = spark.read.parquet(f"{out}/extract/data").filter(
        (~F.col("is_low_quality")) & (~F.col("parse_failed"))
        & (F.col("quality_score") > 0)
    )
    assert pre.count() > pre.select("content_hash").distinct().count()

    # split hygiene: every conversation lives in exactly ONE split
    leaky = (
        cur.select("conv_id", "split").distinct()
        .groupBy("conv_id").count().filter(F.col("count") > 1).count()
    )
    assert leaky == 0
    # split column drives the physical layout (current version dir)
    assert glob.glob(f"{curation.curated_table_path(spark, out)}/split=*")

    # per-split manifests agree with the table
    for s in ("train", "val", "test"):
        man = json.loads(open(f"{out}/manifests/split-{s}.json").read())
        assert man["n_docs"] == cur.filter(F.col("split") == s).count()
        assert man["n_convs"] == (
            cur.filter(F.col("split") == s).select("conv_id").distinct().count()
        )
        if man["n_docs"]:
            assert sum(man["languages"].values()) == man["n_docs"]
            assert man["total_tokens"] > 0

    # curation columns present and populated
    assert cur.filter(F.col("predicted_lang").isNull()).count() == 0
    assert cur.filter(F.col("n_tokens") <= 0).count() == 0

    # idempotent resume: a second run with the same snapshot skips both
    # stages and rewrites NOTHING (file mtimes pinned)
    before = _file_mtimes(out)
    m2 = curation.run_curation(spark, src, out, n_buckets=8,
                               input_snapshot="snap1")
    assert m2["extract"].get("skipped") and m2["curate"].get("skipped")
    assert _file_mtimes(out) == before

    # a NEW snapshot invalidates stage completion and recomputes
    m3 = curation.run_curation(spark, src, out, n_buckets=8,
                               input_snapshot="snap2")
    assert not m3["curate"].get("skipped")
    assert m3["curate"]["n_docs"] == n_curated  # deterministic recompute


def test_curate_documents_near_dup_policy(spark):
    """Near-identical texts (one-char edits of a long body) collapse to one
    canonical doc; distinct texts all survive; the canonical is the min
    doc_uid of its cluster."""
    body = "the quick brown fox jumps over the lazy dog " * 6
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(6)],
            "turn_idx": [0] * 6,
            "role": ["user"] * 6,
            "tool": [None] * 6,
            "ts": pd.Timestamp("2025-01-01"),
            "text": [
                body + "alpha",
                body + "alphq",          # near dup of 0
                body + "alphz",          # near dup of 0
                "completely different content about financial records and flight manifests",
                "another unrelated body regarding property deeds and bank transfers",
                body + "alpha",          # exact dup of 0 (removed pre-near-dup)
            ],
        }
    )
    tr = spark.createDataFrame(pdf)
    from epstein_browser_spark.pipeline import extract_transcripts

    extracted = extract_transcripts(tr, n_buckets=4)
    cur = curation.curate_documents(extracted, near_threshold=0.7).toPandas()
    texts = set(cur["clean_text"])
    # exactly one representative of the near-dup family survives
    assert sum(t.startswith(body[:40]) for t in texts) == 1
    # the two unrelated docs survive
    assert len(cur) == 3
    assert set(cur["split"]) <= {"train", "val", "test"}


def _incr_rows(rows):
    """Transcript-schema frame for an increment batch."""
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pd.array([0] * len(rows), dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[1] for r in rows],
            "tool": pd.array([None] * len(rows), dtype="string"),
            "ts": pd.to_datetime(["2024-02-01 00:00:00"] * len(rows)),
        }
    )


def test_incremental_curation(spark, corpus_sdf, tmp_path):
    """A new batch dedups against the EXISTING corpus via the persisted
    minhash scratch index + content hashes: exact and near dups of old
    docs are dropped, novel docs are appended, a second increment dedups
    against the first, the base table is never rewritten, and a retried
    snapshot is idempotent."""
    out = str(tmp_path / "cur")
    curation.run_curation(spark, corpus_sdf, out, n_buckets=8,
                          input_snapshot="base")
    base = curation.read_curated(spark, out)
    n_base = base.count()
    # a long quality-passing doc from the base corpus to duplicate
    seed_text = (
        base.filter(F.length("clean_text") > 200)
        .select("clean_text").first()[0]
    )
    novel1 = ("the committee reviewed forty novel exhibits about migratory "
              "seabirds nesting along basalt cliffs and recorded wingspan "
              "measurements for each tagged individual during the survey")
    novel2 = ("quarterly reconciliation of the harbor ledger revealed three "
              "misfiled invoices relating to rope purchases and a credit "
              "for returned lanterns processed after the audit window")
    pair_a = ("deterministic replay of the ingestion log reproduced the "
              "checkpoint divergence on the seventh shard exactly as the "
              "operators reported during the overnight incident review")
    pair_b = pair_a + " with two extra trailing words"
    incr1 = spark.createDataFrame(_incr_rows([
        ("inc_exact", seed_text),            # exact dup of base -> dropped
        ("inc_near", seed_text + " padded"), # near dup of base -> dropped
        ("inc_novel1", novel1),
        ("inc_novel2", novel2),
        ("inc_pair_a", pair_a),              # near-dup pair within the
        ("inc_pair_b", pair_b),              # increment -> one canonical
    ]))
    m1 = curation.run_curation_increment(spark, incr1, out, snapshot="inc1",
                                         n_buckets=4)
    assert m1["curate"]["n_docs"] == 3
    base_path = curation.curated_table_path(spark, out)
    mt_base = _file_mtimes(base_path)

    spark.catalog.refreshByPath(f"{out}/curated_incr")
    all_cur = curation.read_curated(spark, out)
    assert all_cur.count() == n_base + 3
    got_convs = {
        r["conv_id"] for r in
        all_cur.filter(F.col("conv_id").startswith("inc_")).collect()
    }
    assert "inc_exact" not in got_convs and "inc_near" not in got_convs
    assert {"inc_novel1", "inc_novel2"} <= got_convs
    assert len(got_convs & {"inc_pair_a", "inc_pair_b"}) == 1

    # idempotent retry of the same snapshot: skipped, nothing rewritten
    mt1 = _file_mtimes(out)
    m1b = curation.run_curation_increment(spark, incr1, out, snapshot="inc1",
                                          n_buckets=4)
    assert m1b["curate"].get("skipped")
    assert _file_mtimes(out) == mt1

    # second increment: near-dup of the FIRST increment's novel doc is
    # dropped (the index grew), a fresh doc is appended
    novel3 = ("archival weather observations from the lighthouse station "
              "were digitized and cross checked against ship logs covering "
              "the same fortnight of unusually calm glassy seas")
    incr2 = spark.createDataFrame(_incr_rows([
        ("inc2_nearprev", novel1 + " appended"),  # near dup of inc1 novel
        ("inc2_novel", novel3),
    ]))
    m2 = curation.run_curation_increment(spark, incr2, out, snapshot="inc2",
                                         n_buckets=4)
    assert m2["curate"]["n_docs"] == 1
    spark.catalog.refreshByPath(f"{out}/curated_incr")
    all_cur = curation.read_curated(spark, out)
    assert all_cur.count() == n_base + 4
    convs2 = {r["conv_id"] for r in
              all_cur.filter(F.col("conv_id").startswith("inc2_")).collect()}
    assert convs2 == {"inc2_novel"}
    # a fully-redelivered batch (everything already curated or dropped)
    # records 0 docs instead of crashing on empty-parquet schema inference
    m3 = curation.run_curation_increment(spark, incr1, out, snapshot="inc3",
                                         n_buckets=4)
    assert m3["curate"]["n_docs"] == 0 and m3["curate"]["splits"] == {}
    # reserved snapshot names are rejected before any write
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.run_curation_increment(spark, incr1, out, snapshot="base")
    # the base table (same version dir) was never touched by any increment
    assert curation.curated_table_path(spark, out) == base_path
    assert _file_mtimes(base_path) == mt_base
    # incremental manifests exist and agree
    man = json.loads(open(glob.glob(
        f"{out}/manifests/incr-inc2-*.json")[0]).read())
    assert man["n_docs"] == 1


def test_compaction_and_vacuum(spark, corpus_sdf, tmp_path):
    """Lifecycle maintenance: bucket compaction collapses multi-file
    buckets without touching compliant ones or changing data; vacuum
    removes an obsolete snapshot's partitions everywhere and allows the
    snapshot id to be re-ingested."""
    from epstein_browser_spark.merge import compact_buckets
    from epstein_browser_spark.pipeline import extract_transcripts

    # build a fragmented bucketed table: two writes -> 2+ files per bucket
    tgt = str(tmp_path / "table")
    ext = extract_transcripts(corpus_sdf, n_buckets=4).localCheckpoint()
    from epstein_browser_spark import fsutil
    fsutil.write_partition_overwrite(ext.filter("turn_idx % 2 = 0"), tgt)
    ext.filter("turn_idx % 2 = 1").write.mode("append") \
        .partitionBy("bucket").parquet(tgt)
    spark.catalog.refreshByPath(tgt)
    before_keys = sorted(
        map(tuple, spark.read.parquet(tgt)
            .select("conv_id", "turn_idx").toPandas().values)
    )
    n_before = len(before_keys)
    frag = glob.glob(f"{tgt}/bucket=*/*.parquet")
    assert len(frag) > 4
    m = compact_buckets(spark, tgt, max_files_per_bucket=1)
    assert m["buckets_compacted"] == 4
    spark.catalog.refreshByPath(tgt)
    assert len(glob.glob(f"{tgt}/bucket=*/*.parquet")) == 4
    after_keys = sorted(
        map(tuple, spark.read.parquet(tgt)
            .select("conv_id", "turn_idx").toPandas().values)
    )
    assert after_keys == before_keys  # content identical, not just counts
    # a compliant table is a no-op (files untouched)
    mt = {f: os.path.getmtime(f)
          for f in glob.glob(f"{tgt}/bucket=*/*.parquet")}
    assert compact_buckets(spark, tgt, max_files_per_bucket=1) == \
        {"buckets_compacted": 0}
    assert {f: os.path.getmtime(f)
            for f in glob.glob(f"{tgt}/bucket=*/*.parquet")} == mt

    # vacuum: base curation + two increments, drop one
    out = str(tmp_path / "cur")
    curation.run_curation(spark, corpus_sdf, out, n_buckets=4,
                          input_snapshot="base")
    novel = ("completely fresh sentences about glacier cores drilled from "
             "the northern shelf and catalogued by depth and isotope ratio")
    inc = spark.createDataFrame(_incr_rows([("va_novel", novel)]))
    curation.run_curation_increment(spark, inc, out, snapshot="s1",
                                    n_buckets=4)
    novel2 = ("the harbor committee tabulated lantern repair invoices "
              "for the autumn quarter and reconciled them against the "
              "chandlery ledger before approving the final payment")
    inc2 = spark.createDataFrame(_incr_rows([("vb_novel", novel2)]))
    curation.run_curation_increment(spark, inc2, out, snapshot="s2",
                                    n_buckets=4)
    n_all = curation.read_curated(spark, out).count()
    r = curation.vacuum_snapshots(spark, out, keep_snaps=["s2"])
    assert r["removed"]["curated_incr"] == ["s1"]
    spark.catalog.refreshByPath(f"{out}/curated_incr")
    assert curation.read_curated(spark, out).count() == n_all - 1
    # vacuumed snapshot can be re-ingested (stage marker removed)
    m2 = curation.run_curation_increment(spark, inc, out, snapshot="s1",
                                         n_buckets=4)
    assert not m2["curate"].get("skipped")
    assert curation.read_curated(spark, out).count() == n_all


def test_in_batch_redelivery_collapses(spark):
    """The same (conv_id, turn_idx) appearing TWICE in one batch (source
    retry inside a delivery) must yield one curated row, not two — min-
    uid-per-hash alone keeps every copy because identical uids trivially
    equal the group min."""
    from epstein_browser_spark.curation import _gated_exact_kept
    from epstein_browser_spark.pipeline import extract_transcripts

    txt = ("a perfectly ordinary quality passing sentence with plenty of "
           "distinct words to clear the extraction gate easily")
    batch = spark.createDataFrame(_incr_rows([
        ("dup_conv", txt), ("dup_conv", txt),  # same turn twice
        ("other_conv", txt + " but different"),
    ]))
    ext = extract_transcripts(batch, n_buckets=2)
    kept = _gated_exact_kept(ext).toPandas()
    assert len(kept) == 2
    assert sorted(kept["conv_id"]) == ["dup_conv", "other_conv"]


def test_conversation_mode_dedup(spark):
    from epstein_browser_spark.pipeline import extract_transcripts
    """unit='conversation': whole conversations are the dedup unit — a
    fully-duplicated conversation collapses, a near-duplicate (one word
    changed) collapses, a half-overlapping one survives, and a turn text
    repeated across two KEPT conversations is preserved (turn mode would
    drop one copy)."""
    turns_a = [
        "the first archival record describes a scheduled deposition with "
        "several named attendees and a court reporter present",
        "a second message lists the flight manifest with departure and "
        "arrival airports for every leg of the documented trip",
        "the closing summary confirms the exhibits were entered into the "
        "docket and the session adjourned before the afternoon recess",
    ]
    rows = []

    def add_conv(cid, texts):
        for i, t in enumerate(texts):
            rows.append({"conv_id": cid, "turn_idx": i, "role": "user",
                         "tool": None, "ts": pd.Timestamp("2025-02-01"),
                         "text": t})

    add_conv("a_orig", turns_a)
    add_conv("b_copy", list(turns_a))                     # exact dup conv
    add_conv("c_near", [turns_a[0],
                        turns_a[1].replace("documented", "recorded"),
                        turns_a[2]])                      # near-dup conv
    add_conv("d_half", [turns_a[0],                       # 1/3 overlap
                        "an unrelated memo catalogs the storage boxes moved "
                        "to the annex with their inventory control numbers",
                        "a final unrelated note requests copies of the "
                        "photographs for the appellate filing next month"])
    pdf = pd.DataFrame(rows)
    pdf["tool"] = pdf["tool"].astype("string")
    extracted = extract_transcripts(spark.createDataFrame(pdf), n_buckets=2)

    conv_mode = curation.curate_documents(
        extracted, unit="conversation").toPandas()
    kept_convs = set(conv_mode["conv_id"])
    assert "a_orig" in kept_convs          # min conv_uid may vary; a or b
    assert not {"b_copy", "c_near"} & kept_convs or \
        "a_orig" not in kept_convs, "dup conversations must collapse"
    # exactly one of the {a_orig, b_copy, c_near} cluster survives
    assert len({"a_orig", "b_copy", "c_near"} & kept_convs) == 1
    assert "d_half" in kept_convs          # 1/3 overlap: below threshold
    # the shared opening turn exists in BOTH kept conversations — conv
    # mode preserves cross-conversation repetition inside kept convs
    shared = conv_mode[conv_mode["clean_text"].str.contains(
        "scheduled deposition")]
    assert len(shared) == 2 and set(shared["conv_id"]) <= kept_convs

    # contrast: turn mode deduplicates that shared text across convs
    turn_mode = curation.curate_documents(extracted, unit="turn").toPandas()
    shared_t = turn_mode[turn_mode["clean_text"].str.contains(
        "scheduled deposition")]
    assert len(shared_t) == 1


def test_conversation_mode_through_run_curation(spark, tmp_path):
    import pytest
    texts = {
        "x": "conversation x turn {i} discusses the archival records and "
             "the scheduled depositions in detail",
        "y": "an entirely different dialog about flight manifests, "
             "inventory boxes and appellate filings for session {i}",
    }
    pdf = pd.DataFrame([
        {"conv_id": c, "turn_idx": i, "role": "user", "tool": None,
         "ts": pd.Timestamp("2025-02-01"),
         "text": texts[c].format(i=i)}
        for c in ("x", "y") for i in range(3)
    ] + [
        {"conv_id": "x_dup", "turn_idx": i, "role": "user", "tool": None,
         "ts": pd.Timestamp("2025-02-01"),
         "text": f"conversation x turn {i} discusses the archival "
                 f"records and the scheduled depositions in detail"}
        for i in range(3)
    ])
    pdf["tool"] = pdf["tool"].astype("string")
    out = str(tmp_path / "convmode")
    m = curation.run_curation(spark, spark.createDataFrame(pdf), out,
                              n_buckets=2, unit="conversation",
                              input_snapshot="s0")
    assert m["curate"]["unit"] == "conversation"
    cur = curation.read_curated(spark, out)
    kept = {r["conv_id"] for r in cur.select("conv_id").distinct().collect()}
    assert len(kept & {"x", "x_dup"}) == 1 and "y" in kept
    # an increment whose EXPLICIT unit mismatches the base is refused
    # loudly (the default inherits the base unit and works — pinned by
    # tests/test_conv_increment.py)
    with pytest.raises(NotImplementedError, match="unit"):
        curation.run_curation_increment(
            spark, spark.createDataFrame(pdf), out, snapshot="b1",
            n_buckets=2, unit="turn")
