"""Regression tests for the round-5 self-review findings: promote
rollback after a crash mid-tree-deletion, stale feature rows of replaced
conversations in the against-corpus verify set, the redact_pii
content-hash tie-break, stale snapshot trees surviving a zero-doc re-run,
the winnowing key's position-field width, and write_transcripts' iceberg
path routing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import curation, fsutil, sources, textstats

BODY = {
    "a": [
        "the first archival record describes a scheduled deposition with "
        "several named attendees and a court reporter present",
        "a second message lists the flight manifest with departure and "
        "arrival airports for every leg of the documented trip",
        "the closing summary confirms the exhibits were entered into the "
        "docket and the session adjourned before the afternoon recess",
    ],
    "b": [
        "an unrelated memo catalogs the storage boxes moved to the annex "
        "with their inventory control numbers and shelf positions",
        "a follow up note requests photographs of each container before "
        "the appellate filing deadline at the end of next month",
    ],
}
A_EXT1 = [
    "a supplemental filing adds two exhibits recovered from the annex "
    "storage boxes with their chain of custody paperwork attached",
]
A_EXT2 = [
    "the final addendum certifies the corrected transcript and closes "
    "the record pending the appellate court's scheduling order",
]


def _rows(conv_id, texts, start_idx=0):
    return [
        {"conv_id": conv_id, "turn_idx": start_idx + i, "role": "user",
         "tool": None, "ts": pd.Timestamp("2025-03-01"), "text": t}
        for i, t in enumerate(texts)
    ]


def _sdf(spark, rows):
    pdf = pd.DataFrame(rows)
    pdf["tool"] = pdf["tool"].astype("string")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


@pytest.fixture()
def conv_base(spark, tmp_path):
    out = str(tmp_path / "convbase")
    curation.run_curation(
        spark, _sdf(spark, _rows("a", BODY["a"]) + _rows("b", BODY["b"])),
        out, n_buckets=2, unit="conversation", input_snapshot="s0")
    return out


def test_promote_crash_mid_delete_keeps_newest_version(
        spark, conv_base, monkeypatch):
    """The r5 rollback finding: two increments extend conversation 'a'
    (snapshots named so the HIGHER-seq tree deletes first); a crash
    between the two tree deletions must not let the retry re-fold the
    surviving lower-seq tree over the already-installed newer version."""
    out = conv_base
    # 'b1' folds seq 1, 'a2' folds seq 2 — sorted deletion order deletes
    # a2 (the winner) first, the worst case for a recompute-from-survivors
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", A_EXT1, start_idx=3)), out,
        snapshot="b1", n_buckets=2)
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", A_EXT2, start_idx=4)), out,
        snapshot="a2", n_buckets=2)
    want = curation.read_curated(spark, out).toPandas()
    assert (want.conv_id == "a").sum() == 5  # 3 base + 2 extensions

    real_delete = fsutil.delete

    def crash_on_b1(sp, path, recursive=True):
        if curation.CURATED_INCR in path and path.endswith("snap=b1"):
            raise RuntimeError("simulated crash before deleting snap=b1")
        return real_delete(sp, path, recursive)

    monkeypatch.setattr(curation.fsutil, "delete", crash_on_b1)
    with pytest.raises(RuntimeError, match="simulated crash"):
        curation.promote_increments(spark, out)
    monkeypatch.setattr(curation.fsutil, "delete", real_delete)

    # the crashed promote installed the full-fold winners already; the
    # surviving b1 tree must not roll conversation a back to 4 turns
    curation.promote_increments(spark, out)
    got = curation.read_curated(spark, out).toPandas()
    a_rows = got[got.conv_id == "a"].sort_values("turn_idx")
    assert list(a_rows.turn_idx) == [0, 1, 2, 3, 4]
    assert sorted(got.clean_text) == sorted(want.clean_text)
    # fully committed: no snap trees, no markers, no intent
    for tree in (curation.CURATED_INCR, "_scratch/minhash_incr"):
        assert not fsutil.exists(spark, f"{out}/{tree}/snap=b1")
        assert not fsutil.exists(spark, f"{out}/{tree}/snap=a2")
    assert not fsutil.exists(spark, f"{out}/_stages/promote-intent.json")
    feats = spark.read.parquet(f"{out}/_scratch/minhash").toPandas()
    assert feats.id.is_unique


def test_conv_increment_verify_excludes_replaced_ids(
        spark, conv_base, monkeypatch):
    """The against-corpus verify set must hold exactly ONE feature row
    per id: a redelivered conversation's stored (superseded) grams were
    unioned next to its new grams, and verify_pairs kept any pair that
    matched EITHER version."""
    out = conv_base
    captured = []
    real_verify = curation.verify_pairs

    def capture(pairs, feats, *args, **kwargs):
        captured.append((pairs, feats))
        return real_verify(pairs, feats, *args, **kwargs)

    monkeypatch.setattr(curation, "verify_pairs", capture)
    m = curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", A_EXT1, start_idx=3)), out,
        snapshot="i1", n_buckets=2)
    assert m["curate"]["n_docs"] > 0
    assert captured, "vs-old verify pass did not run"
    _, all_feats = captured[0]
    dup_ids = (all_feats.groupBy("id").count()
               .filter(F.col("count") > 1).count())
    assert dup_ids == 0


def test_conv_increment_pii_pure_redelivery_noop(spark, tmp_path):
    """With redact_pii, the stored (redacted) turn and a raw redelivery
    of it share doc_uid AND content_hash; the collapse must break the
    tie toward the STORED copy, so a pure redelivery stays a no-op
    instead of re-signing over raw text."""
    out = str(tmp_path / "pii")
    turns = _rows("p", [
        "contact the records clerk at archive.clerk@example.com to "
        "request certified duplicates of the deposition exhibits",
        "the duplicate ledgers were shipped to the annex and logged "
        "under the inventory control numbers issued last spring",
    ]) + _rows("q", BODY["b"])
    curation.run_curation(spark, _sdf(spark, turns), out, n_buckets=2,
                          unit="conversation", redact_pii=True,
                          input_snapshot="s0")
    stored = curation.read_curated(spark, out).toPandas()
    p_text = " ".join(stored[stored.conv_id == "p"].clean_text)
    assert "<EMAIL>" in p_text and "example.com" not in p_text
    m = curation.run_curation_increment(
        spark, _sdf(spark, turns), out, snapshot="i1", n_buckets=2,
        redact_pii=True)
    assert m["curate"]["n_docs"] == 0
    after = curation.read_curated(spark, out).toPandas()
    pd.testing.assert_frame_equal(
        stored.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_conv_increment_rerun_zero_changed_clears_stale_trees(
        spark, conv_base):
    """A settings-changed re-run of a snapshot that now converges to ZERO
    installed docs must delete the prior attempt's trees — the fresh
    marker's seq would otherwise make the stale rows read-visible."""
    out = conv_base
    m1 = curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", A_EXT1, start_idx=3)), out,
        snapshot="s1", n_buckets=2, near_threshold=0.7)
    assert m1["curate"]["n_docs"] == 4  # re-formed 4-turn conversation a
    # re-run the SAME snapshot under different settings, now delivering
    # only the base content of a: pure redelivery -> zero changed
    m2 = curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", BODY["a"])), out,
        snapshot="s1", n_buckets=2, near_threshold=0.6)
    assert m2["curate"]["n_docs"] == 0
    assert not fsutil.exists(
        spark, f"{out}/{curation.CURATED_INCR}/snap=s1")
    cur = curation.read_curated(spark, out).toPandas()
    assert (cur.conv_id == "a").sum() == len(BODY["a"])  # base version


def test_winnow_fingerprints_long_document(spark):
    """Docs with more than 2^20 k-grams: the packed argmin key's position
    field must not go negative (it borrowed from the hash bits and
    corrupted both the window min and the decoded fp_hash/fp_pos)."""
    n = (1 << 20) + 8
    words = [f"w{i % 97}x{i % 89}" for i in range(n)]
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string")
    fp = textstats.winnow_fingerprints(df, "text", "doc_id", k=4, w=5)
    pdf = fp.toPandas()
    n_grams = n - 3
    assert (pdf.fp_pos >= 0).all() and (pdf.fp_pos < n_grams).all()
    assert (pdf.fp_hash >= 0).all()
    # fingerprints exist beyond the old 2^20 boundary
    assert (pdf.fp_pos >= (1 << 20)).any()
    # decoded (pos, hash) pairs are REAL gram hashes: recompute the hash
    # at every selected position and compare
    import hashlib
    for _, row in pdf[pdf.fp_pos >= n_grams - 12].iterrows():
        gram = " ".join(words[int(row.fp_pos):int(row.fp_pos) + 4])
        want = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
        assert int(row.fp_hash) == want


def test_write_transcripts_iceberg_path_uses_iceberg_writer(monkeypatch):
    """An explicit iceberg write to a PATH target must route through the
    iceberg format writer (it silently fell through to parquet when the
    runtime was present)."""
    calls = []

    class FakeWriter:
        def format(self, f):
            calls.append(("format", f))
            return self

        def mode(self, m):
            calls.append(("mode", m))
            return self

        def save(self, t):
            calls.append(("save", t))

    class FakeDF:
        sparkSession = None
        write = FakeWriter()

    monkeypatch.setattr(sources, "iceberg_available", lambda s: True)
    sources.write_transcripts(FakeDF(), "/lake/transcripts",
                              target_format="iceberg")
    assert calls == [("format", "iceberg"), ("mode", "append"),
                     ("save", "/lake/transcripts")]
    calls.clear()
    sources.write_transcripts(FakeDF(), "/lake/transcripts",
                              target_format="iceberg", mode="overwrite")
    assert ("mode", "overwrite") in calls
    with pytest.raises(ValueError, match="target_format"):
        sources.write_transcripts(FakeDF(), "/lake/t", target_format="orc")
