"""promote_increments: folding incremental snapshots into the base tables
(VERDICT r3 item 2). Pins (1) reader equality across the fold, (2) probe
parity — a future increment makes IDENTICAL dedup decisions against the
promoted corpus and the unpromoted snapshot tree, (3) the snapshot unions
collapse (one features table, snap=base-only band index, no stage
markers), (4) idempotence."""

import json
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import curation, fsutil
from epstein_browser_spark.synth import make_transcripts_pdf


@pytest.fixture(scope="module")
def promoted_dirs(spark, tmp_path_factory):
    """Two identical curation outputs (base + one increment); one is then
    promoted. Returns (promoted_dir, unpromoted_dir, incr2_sdf)."""
    root = tmp_path_factory.mktemp("promote")
    pdf = make_transcripts_pdf(n_convs=30, hot_conv_turns=60)
    n = len(pdf)
    base_pdf = pdf.iloc[: n // 2]
    incr1_pdf = pdf.iloc[n // 2: 3 * n // 4].copy()
    incr2_pdf = pdf.iloc[3 * n // 4:].copy()

    out = str(root / "a")
    curation.run_curation(spark, spark.createDataFrame(base_pdf), out,
                          n_buckets=4, input_snapshot="s0")
    curation.run_curation_increment(
        spark, spark.createDataFrame(incr1_pdf), out, snapshot="b1",
        n_buckets=4,
    )
    # bit-identical clone BEFORE promotion
    out2 = str(root / "b")
    shutil.copytree(out, out2)
    return out, out2, spark.createDataFrame(incr2_pdf)


def test_promote_preserves_readers_and_collapses_trees(spark, promoted_dirs):
    out, _out2, _ = promoted_dirs
    before = (
        curation.read_curated(spark, out)
        .orderBy("doc_uid").toPandas().reset_index(drop=True)
    )
    feats_before = sorted(
        r["id"] for r in curation._existing_features(
            spark, out, exclude_snap="x").select("id").collect()
    )
    m = curation.promote_increments(spark, out)
    assert m["promoted_snaps"] == ["b1"]
    assert m["docs_folded"] > 0

    after = (
        curation.read_curated(spark, out)
        .orderBy("doc_uid").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        before.reindex(sorted(before.columns), axis=1),
        after.reindex(sorted(after.columns), axis=1),
    )

    # the K-snapshot unions collapsed to single tables
    assert not fsutil.exists(spark, f"{out}/{curation.CURATED_INCR}/snap=b1")
    assert not fsutil.exists(spark, f"{out}/{curation.SCRATCH_INCR}/snap=b1")
    assert fsutil.list_names(
        spark, f"{out}/{curation.BANDS_DIR}"
    ) and all(
        n == "snap=base" or not n.startswith("snap=")
        for n in fsutil.list_names(spark, f"{out}/{curation.BANDS_DIR}")
    )
    # ... preserving the feature index contents
    feats_after = sorted(
        r["id"] for r in curation._existing_features(
            spark, out, exclude_snap="x").select("id").collect()
    )
    assert feats_after == feats_before
    # the folded snapshot's stage marker is gone (a re-sent b1 would
    # otherwise be skipped as already-complete)
    assert not fsutil.exists(spark, f"{out}/_stages/incr-b1.json")

    # idempotent: nothing left to promote
    m2 = curation.promote_increments(spark, out)
    assert m2["promoted_snaps"] == []


def test_promote_probe_parity_for_future_increments(spark, promoted_dirs):
    """The SAME new batch curated against the promoted corpus and the
    unpromoted snapshot tree keeps exactly the same documents."""
    out, out2, incr2 = promoted_dirs  # `out` was promoted by the test above
    curation.promote_increments(spark, out)  # no-op if already promoted
    m_a = curation.run_curation_increment(spark, incr2, out,
                                          snapshot="b2", n_buckets=4)
    m_b = curation.run_curation_increment(spark, incr2, out2,
                                          snapshot="b2", n_buckets=4)
    assert m_a["curate"]["n_docs"] == m_b["curate"]["n_docs"]
    kept_a = sorted(r["doc_uid"] for r in spark.read.parquet(
        f"{out}/{curation.CURATED_INCR}").select("doc_uid").collect())
    kept_b = sorted(r["doc_uid"] for r in spark.read.parquet(
        f"{out2}/{curation.CURATED_INCR}").filter(
        F.col("snap") == "b2").select("doc_uid").collect())
    assert kept_a == kept_b and len(kept_a) > 0


def test_promote_crash_recovery(spark, tmp_path):
    """Crash windows of the versioned install: (a) a version directory
    written but the pointer never flipped (orphan) must be ignored by
    readers and vacuumed by the next install; (b) a pointer flip that
    died between delete and rename (only the .tmp staging file exists)
    must resolve to the staged state."""
    import shutil as _sh

    out = str(tmp_path / "crash")
    pdf = make_transcripts_pdf(n_convs=8, hot_conv_turns=30)
    half = len(pdf) // 2
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s0")
    curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[half:]), out, snapshot="b1",
        n_buckets=2,
    )
    before = curation.read_curated(spark, out).count()
    cur_path = curation.curated_table_path(spark, out)

    # (a) orphan version above the pointer: written, never flipped
    orphan = f"{out}/{curation.CURATED_VERSION_PREFIX}000099"
    _sh.copytree(cur_path, orphan)
    assert curation.curated_table_path(spark, out) == cur_path  # ignored
    m = curation.promote_increments(spark, out)
    assert m["promoted_snaps"] == ["b1"]
    assert curation.read_curated(spark, out).count() == before
    # the fold installed ABOVE the orphan (no version-name reuse) and
    # the orphan was vacuumed as a dead write
    assert not fsutil.exists(spark, orphan)
    new_path = curation.curated_table_path(spark, out)
    assert int(new_path.rsplit("_v", 1)[1]) > 99

    # (b) pointer mid-flip: old pointer deleted, staging file present
    ptr = f"{out}/{curation.CURATED_POINTER}"
    raw = fsutil.read_text(spark, ptr)
    fsutil.write_text(spark, ptr + ".tmp", raw)
    fsutil.delete(spark, ptr, recursive=False)
    assert curation.curated_table_path(spark, out) == new_path
    assert curation.read_curated(spark, out).count() == before


def test_promote_legacy_layout_crash_recovery(spark, tmp_path):
    """A PRE-versioned output that died mid rename-install (live tree
    renamed aside) still recovers: promote restores curated__old to
    curated/ before folding, and the fold migrates the table to the
    versioned layout."""
    out = str(tmp_path / "legacy")
    pdf = make_transcripts_pdf(n_convs=8, hot_conv_turns=30)
    half = len(pdf) // 2
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s0")
    curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[half:]), out, snapshot="b1",
        n_buckets=2,
    )
    before = curation.read_curated(spark, out).count()
    # rebuild the legacy layout: version dir demoted to curated/, no ptr
    ver = curation.curated_table_path(spark, out)
    assert fsutil.rename(spark, ver, f"{out}/curated")
    fsutil.delete(spark, f"{out}/{curation.CURATED_POINTER}",
                  recursive=False)
    assert curation.curated_table_path(spark, out) == f"{out}/curated"
    # ...then the legacy mid-swap crash: live renamed aside
    assert fsutil.rename(spark, f"{out}/curated", f"{out}/curated__old")
    m = curation.promote_increments(spark, out)
    assert m["promoted_snaps"] == ["b1"]
    assert curation.read_curated(spark, out).count() == before
    assert curation.curated_table_path(spark, out).rsplit("/", 1)[1] \
        .startswith(curation.CURATED_VERSION_PREFIX)


def test_reader_survives_concurrent_promote(spark, tmp_path):
    """THE r4 verdict item 4: a reader that resolved the curated table
    BEFORE a promote (or a full recurate) collects its rows AFTER the
    install without FileNotFound — the resolved version directory is
    immutable and retained by the vacuum window."""
    out = str(tmp_path / "reader")
    pdf = make_transcripts_pdf(n_convs=10, hot_conv_turns=30)
    half = len(pdf) // 2
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s0")
    curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[half:]), out, snapshot="b1",
        n_buckets=2,
    )
    # reader resolves the BASE table plan now (file listing captured)
    base_reader = curation._read_curated_base(spark, out)
    n_base = base_reader.count()

    m = curation.promote_increments(spark, out)  # concurrent install
    assert m["promoted_snaps"] == ["b1"]

    # the held pre-promote plan re-collects from its retained version
    # directory — the old rename-install deleted those files
    assert base_reader.count() == n_base

    # a reader resolved on the NEW state survives a full RECURATE too
    reader2 = curation.read_curated(spark, out)
    n2 = reader2.count()
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s1")
    assert reader2.count() == n2  # old version retained, plan re-collects

    # retention window: current + previous versions exist, older vacuumed
    import glob as _glob
    vdirs = sorted(_glob.glob(f"{out}/{curation.CURATED_VERSION_PREFIX}*"))
    assert len(vdirs) == 2


def test_promote_post_swap_crash_window_no_duplicates(spark, tmp_path):
    """The OTHER crash window (r4 review): promote folded curated/ and
    died before deleting curated_incr — a retry must converge to exactly
    one copy of every folded row and still clear the stage marker."""
    import shutil

    out = str(tmp_path / "crash2")
    pdf = make_transcripts_pdf(n_convs=8, hot_conv_turns=30)
    half = len(pdf) // 2
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s0")
    curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[half:]), out, snapshot="b1",
        n_buckets=2,
    )
    # stash the increment state, promote fully, then re-plant the
    # increment trees + marker: exactly the state a crash after the
    # curated swap (but before cleanup) leaves behind
    incr_copy = str(tmp_path / "incr_copy")
    shutil.copytree(f"{out}/{curation.CURATED_INCR}", incr_copy)
    marker = (tmp_path / "crash2" / "_stages" / "incr-b1.json").read_text()
    before = curation.read_curated(spark, out).count()
    m1 = curation.promote_increments(spark, out)
    assert m1["promoted_snaps"] == ["b1"]
    shutil.copytree(incr_copy, f"{out}/{curation.CURATED_INCR}",
                    dirs_exist_ok=True)
    (tmp_path / "crash2" / "_stages" / "incr-b1.json").write_text(marker)

    m2 = curation.promote_increments(spark, out)
    assert m2["promoted_snaps"] == ["b1"]
    cur = curation.read_curated(spark, out)
    assert cur.count() == before
    dup_uids = (cur.groupBy("doc_uid").count()
                .filter("count > 1").count())
    assert dup_uids == 0
    assert not fsutil.exists(spark, f"{out}/_stages/incr-b1.json")

    # marker-only leftover (trees cleaned, marker not): retry clears it
    (tmp_path / "crash2" / "_stages" / "incr-b1.json").write_text(marker)
    m3 = curation.promote_increments(spark, out)
    assert m3["promoted_snaps"] == ["b1"]
    assert not fsutil.exists(spark, f"{out}/_stages/incr-b1.json")
    assert curation.read_curated(spark, out).count() == before


def test_read_optional_corrupt_table_raises(spark, tmp_path):
    """An existing-but-unreadable table must FAIL, not read as 'nothing
    curated yet' (which would silently disable against-corpus dedup)."""
    import glob

    import pandas as pd
    import pytest

    p = str(tmp_path / "tbl")
    spark.createDataFrame(pd.DataFrame({"x": [1, 2]})).write.parquet(p)
    part = glob.glob(f"{p}/part-*.parquet")[0]
    with open(part, "wb") as f:
        f.write(b"not a parquet file at all")
    spark.catalog.refreshByPath(p)
    with pytest.raises(Exception):
        curation._read_optional(spark, p).count()
    # absent path still maps to None
    assert curation._read_optional(spark, str(tmp_path / "nope")) is None


def test_promote_skips_half_committed_increment(spark, tmp_path):
    """An increment that crashed after writing its feature/band
    partitions but BEFORE its stage marker must NOT fold (folding its
    features would make the increment's retry anti-join its own docs
    away and commit 0 docs — r4 review). The retry completes normally
    after a promote ran in between."""
    out = str(tmp_path / "halfcommit")
    pdf = make_transcripts_pdf(n_convs=10, hot_conv_turns=30)
    half = len(pdf) // 2
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:half]), out,
                          n_buckets=2, input_snapshot="s0")
    inc_sdf = spark.createDataFrame(pdf.iloc[half:])
    m = curation.run_curation_increment(spark, inc_sdf, out, snapshot="b1",
                                        n_buckets=2)
    n_docs_b1 = m["curate"]["n_docs"]
    assert n_docs_b1 > 0
    # simulate the half-commit: features + bands exist, marker and
    # curated rows do NOT (the state after a crash mid-increment)
    fsutil.delete(spark, f"{out}/_stages/incr-b1.json", recursive=False)
    fsutil.delete(spark, f"{out}/{curation.CURATED_INCR}/snap=b1")

    mp = curation.promote_increments(spark, out)
    assert mp["promoted_snaps"] == []          # nothing marked -> no fold
    assert fsutil.exists(spark, f"{out}/{curation.SCRATCH_INCR}/snap=b1")

    # the increment retry (same snapshot) now completes with its docs
    m2 = curation.run_curation_increment(spark, inc_sdf, out, snapshot="b1",
                                         n_buckets=2)
    assert m2["curate"]["n_docs"] == n_docs_b1


def test_promote_keeps_zero_doc_redelivery_marker(spark, tmp_path):
    """A fully-redelivered batch leaves a 0-doc marker and no trees;
    promote must keep that marker (it is the redelivery short-circuit)
    and not report the snapshot as promoted."""
    out = str(tmp_path / "zerodoc")
    pdf = make_transcripts_pdf(n_convs=8, hot_conv_turns=30)
    curation.run_curation(spark, spark.createDataFrame(pdf), out,
                          n_buckets=2, input_snapshot="s0")
    # redeliver the SAME data as an increment: everything dedups away
    m = curation.run_curation_increment(
        spark, spark.createDataFrame(pdf), out, snapshot="redeliver",
        n_buckets=2)
    assert m["curate"]["n_docs"] == 0
    mp = curation.promote_increments(spark, out)
    assert "redeliver" not in mp["promoted_snaps"]
    assert fsutil.exists(spark, f"{out}/_stages/incr-redeliver.json")
    # ... and the marker still short-circuits a re-redelivery
    m2 = curation.run_curation_increment(
        spark, spark.createDataFrame(pdf), out, snapshot="redeliver",
        n_buckets=2)
    assert m2["curate"].get("skipped") is True


def test_resume_key_includes_token_counter(spark, tmp_path):
    """Re-running a completed job with bpe_merges newly enabled must
    RECOMPUTE the curate stage (r4 review: the resume marker used to
    match on input_snapshot alone and silently kept proxy counts)."""
    from epstein_browser_spark import bpe

    out = str(tmp_path / "bperesume")
    pdf = make_transcripts_pdf(n_convs=6, hot_conv_turns=20)
    sdf = spark.createDataFrame(pdf)
    m1 = curation.run_curation(spark, sdf, out, n_buckets=2,
                               input_snapshot="s0")
    assert m1["curate"].get("skipped") is None
    ws_tokens = {r["doc_uid"]: r["n_tokens"] for r in
                 curation.read_curated(spark, out)
                 .select("doc_uid", "n_tokens").collect()}

    merges = bpe.train_merges_local([("the", 5), ("record", 4),
                                     ("flight", 3)], 10)
    m2 = curation.run_curation(spark, sdf, out, n_buckets=2,
                               input_snapshot="s0", bpe_merges=merges)
    assert m2["curate"].get("skipped") is None   # NOT skipped: recomputed
    assert m2["curate"]["token_counter"] == "bpe"
    bpe_tokens = {r["doc_uid"]: r["n_tokens"] for r in
                  curation.read_curated(spark, out)
                  .select("doc_uid", "n_tokens").collect()}
    assert bpe_tokens != ws_tokens
    # identical rerun WITH the same setting resumes
    m3 = curation.run_curation(spark, sdf, out, n_buckets=2,
                               input_snapshot="s0", bpe_merges=merges)
    assert m3["curate"].get("skipped") is True


def test_resume_key_includes_redact_pii(spark, tmp_path):
    """Re-running a completed job with redact_pii newly enabled must
    recompute (r4 review pass 3): raw PII must not survive behind a
    skipped-success."""
    out = str(tmp_path / "piiresume")
    pdf = pd.DataFrame([{
        "conv_id": "a", "turn_idx": 0, "role": "user", "tool": None,
        "ts": pd.Timestamp("2025-03-01"),
        "text": "please send the archived records to analyst@example.com "
                "before the deposition begins tomorrow morning",
    }])
    pdf["tool"] = pdf["tool"].astype("string")
    sdf = spark.createDataFrame(pdf)
    m1 = curation.run_curation(spark, sdf, out, n_buckets=2,
                               input_snapshot="s0")
    assert m1["curate"].get("skipped") is None
    m2 = curation.run_curation(spark, sdf, out, n_buckets=2,
                               input_snapshot="s0", redact_pii=True)
    assert m2["curate"].get("skipped") is None   # recomputed
    txt = curation.read_curated(spark, out).collect()[0]["clean_text"]
    assert "<EMAIL>" in txt and "analyst@" not in txt


def test_numeric_snapshot_ids_end_to_end(spark, tmp_path):
    """All-numeric snapshot ids: partition inference reads snap as INT,
    and string comparisons against it become NULL — which used to make
    _existing_features/_existing_curated filter out EVERY row (probes
    against nothing) and promote drop passthrough partitions. The snap
    column is normalized to string at every read (r4 review pass 3)."""
    out = str(tmp_path / "numsnap")
    pdf = make_transcripts_pdf(n_convs=10, hot_conv_turns=30)
    third = len(pdf) // 3
    curation.run_curation(spark, spark.createDataFrame(pdf.iloc[:third]),
                          out, n_buckets=2, input_snapshot="s0")
    m1 = curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[third:2 * third]), out,
        snapshot="20240101", n_buckets=2)
    assert m1["curate"]["n_docs"] > 0
    n_after_1 = curation.read_curated(spark, out).count()
    # REDELIVER the same batch under a new numeric id: the against-corpus
    # probe must drop everything (with the int-typed snap bug it admitted
    # every doc again)
    m2 = curation.run_curation_increment(
        spark, spark.createDataFrame(pdf.iloc[third:2 * third]), out,
        snapshot="20240102", n_buckets=2)
    assert m2["curate"]["n_docs"] == 0
    assert curation.read_curated(spark, out).count() == n_after_1
    # promote with numeric snaps folds cleanly
    mp = curation.promote_increments(spark, out)
    assert "20240101" in mp["promoted_snaps"]
    assert curation.read_curated(spark, out).count() == n_after_1


def test_rerun_new_snapshot_replaces_stale_partitions(spark, tmp_path):
    """The curate stage installs the table by FULL swap: a re-run under a
    new input snapshot whose gate keeps zero docs must not leave the
    previous snapshot's partitions readable (r4 review pass 3)."""
    import pytest

    out = str(tmp_path / "stale")
    good = make_transcripts_pdf(n_convs=6, hot_conv_turns=20)
    m1 = curation.run_curation(spark, spark.createDataFrame(good), out,
                               n_buckets=2, input_snapshot="v1")
    assert m1["curate"]["n_docs"] > 0
    junk = good.copy()
    junk["text"] = "x"          # every row fails the gate
    m2 = curation.run_curation(spark, spark.createDataFrame(junk), out,
                               n_buckets=2, input_snapshot="v2",
                               resume=False)
    assert m2["curate"]["n_docs"] == 0
    with pytest.raises(FileNotFoundError):
        curation.read_curated(spark, out)
    man = json.loads((tmp_path / "stale" / "manifests" /
                      "split-train.json").read_text())
    assert man["n_docs"] == 0 and man["input_snapshot"] == "v2"


def test_run_curation_empty_input_corpus(spark, tmp_path):
    """A zero-row input (empty daily partition) completes with zero-doc
    manifests instead of crashing on schema inference."""
    import pytest

    from epstein_browser_spark.pipeline import TRANSCRIPTS_SCHEMA

    out = str(tmp_path / "emptyin")
    empty = spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    m = curation.run_curation(spark, empty, out,
                              n_buckets=2, input_snapshot="s0")
    assert m["curate"]["n_docs"] == 0
    with pytest.raises(FileNotFoundError):
        curation.read_curated(spark, out)


def test_n_tokens_counted_on_stored_text(spark, tmp_path):
    """With redact_pii the stored n_tokens describes the REDACTED text
    the table contains (one <EMAIL> token), not the original."""
    out = str(tmp_path / "ntok")
    pdf = pd.DataFrame([{
        "conv_id": "a", "turn_idx": 0, "role": "user", "tool": None,
        "ts": pd.Timestamp("2025-03-01"),
        "text": "contact first.person@example.com second.person@example.com "
                "third.person@example.com about the archived records now",
    }])
    pdf["tool"] = pdf["tool"].astype("string")
    curation.run_curation(spark, spark.createDataFrame(pdf), out,
                          n_buckets=2, input_snapshot="s0",
                          redact_pii=True)
    row = curation.read_curated(spark, out).collect()[0]
    assert row["n_tokens"] == len(row["clean_text"].split())
