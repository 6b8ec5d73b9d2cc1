"""Round-5 self-review PASS 2 regression pins (8 findings over the r5
diff: promote-intent retry scope, re-run seq gating, stale split
partitions/manifests, lm_perplexity vocabulary, auto-path write
downgrade, and the conv-increment refinement pass for stored text of
replaced-but-not-installed conversations)."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import curation, fsutil, textstats

BODIES = {
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
Z_EXT = [
    "quarterly reconciliation of the harbor ledger revealed three "
    "misfiled invoices relating to rope purchases and lantern credit",
    "the audit committee approved the corrected totals and scheduled "
    "a review of the chandlery accounts for the spring session",
    "a final appendix tabulates the demurrage charges assessed against "
    "late departures and the waivers granted by the harbormaster",
]
D_NOVEL = [
    "archival weather observations from the lighthouse station were "
    "digitized and cross checked against ship logs from the same weeks",
    "the digitization team noted three gaps in the barometric series "
    "and flagged them for retrieval from the duplicate ledgers",
]
E_NOVEL = [
    "the cartography annex released corrected soundings for the north "
    "channel after the survey vessel completed its second transit",
    "pilots were advised that the revised charts supersede all printed "
    "editions distributed before the start of the navigation season",
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
        spark, _sdf(spark, _rows("a", BODIES["a"]) + _rows("b", BODIES["b"])),
        out, n_buckets=2, unit="conversation", input_snapshot="s0")
    return out


def _marker(spark, out, snap):
    return json.loads(fsutil.read_text(spark, f"{out}/_stages/incr-{snap}.json"))


def _intent_path(out):
    return curation._stage_path(out, "promote-intent")


# --------------------------------------------------------------------------
# Finding 1: a promote retry driven by a stale intent must clear ONLY its
# own fold set's markers — an increment that completed between the crash
# and the retry keeps its marker and trees (and folds on the next promote).
# --------------------------------------------------------------------------

def test_promote_intent_retry_spares_post_crash_increment(spark, conv_base):
    out = conv_base
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("d", D_NOVEL)), out, snapshot="i1",
        n_buckets=2)
    seq1 = int(_marker(spark, out, "i1")["seq"])
    # simulate a promote that crashed right after writing its intent
    fsutil.write_text(spark, _intent_path(out),
                      json.dumps({"fold": {"i1": seq1}, "phases": []}))
    # a NEW increment completes before the retry
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("e", E_NOVEL)), out, snapshot="i2",
        n_buckets=2)
    n_vis = curation.read_curated(spark, out).count()

    mp = curation.promote_increments(spark, out)
    assert mp["promoted_snaps"] == ["i1"]
    # i2 is untouched: marker + trees survive, nothing goes invisible
    assert fsutil.exists(spark, f"{out}/_stages/incr-i2.json")
    assert fsutil.exists(spark, f"{out}/{curation.CURATED_INCR}/snap=i2")
    cur = curation.read_curated(spark, out)
    assert cur.count() == n_vis
    assert cur.filter(F.col("conv_id") == "e").count() == len(E_NOVEL)
    # the next promote folds i2 normally
    mp2 = curation.promote_increments(spark, out)
    assert mp2["promoted_snaps"] == ["i2"]
    assert curation.read_curated(spark, out).count() == n_vis


# --------------------------------------------------------------------------
# Finding 2: a snapshot RE-RUN between the crash and the retry (newer
# marker seq than the intent recorded) is excluded from the retry
# entirely — its trees and marker survive, and it folds next promote.
# --------------------------------------------------------------------------

def test_promote_intent_retry_excludes_rerun_snapshot(spark, conv_base):
    out = conv_base
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("d", D_NOVEL)), out, snapshot="i1",
        n_buckets=2)
    seq1 = int(_marker(spark, out, "i1")["seq"])
    # crashed promote recorded i1@seq1 with the curated fold already done
    fsutil.write_text(spark, _intent_path(out), json.dumps(
        {"fold": {"i1": seq1}, "phases": ["curated"]}))
    # i1 re-runs with DIFFERENT content before the retry
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("e", E_NOVEL)), out, snapshot="i1",
        n_buckets=2, resume=False)
    seq2 = int(_marker(spark, out, "i1")["seq"])
    assert seq2 != seq1

    mp = curation.promote_increments(spark, out)
    # the retry must NOT fold, delete, or clear the re-run's state
    assert mp["promoted_snaps"] == []
    assert fsutil.exists(spark, f"{out}/_stages/incr-i1.json")
    assert fsutil.exists(spark, f"{out}/{curation.CURATED_INCR}/snap=i1")
    cur = curation.read_curated(spark, out).toPandas()
    assert set(cur.conv_id) >= {"e"} and "d" not in set(cur.conv_id)
    # intent consumed; the NEXT promote folds the re-run's content
    assert not fsutil.exists(spark, _intent_path(out))
    mp2 = curation.promote_increments(spark, out)
    assert mp2["promoted_snaps"] == ["i1"]
    cur2 = curation.read_curated(spark, out).toPandas()
    assert (cur2.conv_id == "e").sum() == len(E_NOVEL)
    assert "d" not in set(cur2.conv_id)


# --------------------------------------------------------------------------
# Findings 3 + 7: a re-run whose split composition differs from the prior
# attempt must not leave the prior attempt's split partitions (rows would
# resurrect under the fresh marker's seq) or split manifests behind.
# --------------------------------------------------------------------------

def test_clear_stale_splits_removes_partitions_and_manifests(spark, tmp_path):
    out = str(tmp_path / "o")
    snap = f"{out}/{curation.CURATED_INCR}/snap=s1"
    for sp in ("train", "test"):
        fsutil.mkdirs(spark, f"{snap}/split={sp}")
    fsutil.mkdirs(spark, f"{out}/manifests")
    for name in ("incr-s1-train.json", "incr-s1-test.json",
                 "incr-s2-test.json"):
        fsutil.write_text(spark, f"{out}/manifests/{name}", "{}")

    curation._clear_stale_splits(spark, out, "s1", kept_splits={"train": 3})

    assert fsutil.exists(spark, f"{snap}/split=train")
    assert not fsutil.exists(spark, f"{snap}/split=test")
    assert fsutil.exists(spark, f"{out}/manifests/incr-s1-train.json")
    assert not fsutil.exists(spark, f"{out}/manifests/incr-s1-test.json")
    # other snapshots' manifests are never touched
    assert fsutil.exists(spark, f"{out}/manifests/incr-s2-test.json")


def test_zero_doc_rerun_clears_stale_manifests(spark, conv_base):
    out = conv_base
    m1 = curation.run_curation_increment(
        spark, _sdf(spark, _rows("d", D_NOVEL)), out, snapshot="i1",
        n_buckets=2)
    assert m1["curate"]["n_docs"] > 0
    stale = [n for n in fsutil.list_names(spark, f"{out}/manifests")
             if n.startswith("incr-i1-")]
    assert stale
    # re-run converges to ZERO docs (pure redelivery of stored conv a)
    m2 = curation.run_curation_increment(
        spark, _sdf(spark, _rows("a", BODIES["a"])), out, snapshot="i1",
        n_buckets=2, resume=False)
    assert m2["curate"]["n_docs"] == 0
    left = [n for n in fsutil.list_names(spark, f"{out}/manifests")
            if n.startswith("incr-i1-")]
    assert left == []
    assert not fsutil.exists(spark, f"{out}/{curation.CURATED_INCR}/snap=i1")
    cur = curation.read_curated(spark, out).toPandas()
    assert "d" not in set(cur.conv_id)


# --------------------------------------------------------------------------
# Finding 4: lm_perplexity's smoothing vocabulary V covers the WHOLE
# corpus — including words that only occur in 1-token documents (which
# contribute no bigram rows but do widen the denominator, and which the
# DuckDB oracle counts).
# --------------------------------------------------------------------------

def test_lm_perplexity_vocab_includes_single_token_docs(spark):
    df = spark.createDataFrame(
        [("d1", "hello world hello"), ("d2", "zzz")],
        "doc_id string, text string")
    r = textstats.lm_perplexity(df).toPandas()
    assert list(r.id) == ["d1"]
    # V = 3 (hello, world, zzz): p = (1+1)/(1+3) per bigram,
    # round(-ln(0.5)*1e6) = 693147 micro-nats x 2 bigrams.
    # A >=2-token-filtered V (=2) gives 810930 instead.
    assert int(r.nll_micro.iloc[0]) == 1386294
    assert int(r.n_bigrams.iloc[0]) == 2


# --------------------------------------------------------------------------
# Finding 5: target_format='auto' with a PATH target keeps writing the
# parquet layout even when the Iceberg runtime is on the classpath —
# appends to pre-existing plain-parquet directories must never silently
# flip formats on a classpath change.
# --------------------------------------------------------------------------

def test_write_transcripts_auto_path_stays_parquet(spark, tmp_path,
                                                   monkeypatch):
    from epstein_browser_spark import sources

    monkeypatch.setattr(sources, "iceberg_available", lambda s: True)
    df = _sdf(spark, _rows("c1", ["hello there"]))
    tgt = str(tmp_path / "tw")
    sources.write_transcripts(df, tgt)  # auto + path
    back = spark.read.parquet(tgt)
    assert back.count() == 1
    assert "pday" in back.columns


# --------------------------------------------------------------------------
# Finding 6: a batch conversation that is replaced but NOT installed
# leaves its STORED text current — survivors must be re-verified against
# that stored text (the refinement pass), or the corpus admits an
# undetected near-duplicate.
# --------------------------------------------------------------------------

def test_conv_increment_refines_against_stored_text_of_dropped(
        spark, tmp_path):
    out = str(tmp_path / "refine")
    # base: conversation x (3 turns) and z (the SAME 3 turns + 3 more —
    # x's shingles are ~half of z's, so both are kept at base time)
    base = _rows("x", BODIES["a"]) + _rows("z", BODIES["a"] + Z_EXT)
    curation.run_curation(spark, _sdf(spark, base), out, n_buckets=2,
                          unit="conversation", input_snapshot="s0")
    cur0 = curation.read_curated(spark, out).toPandas()
    assert {"x", "z"} <= set(cur0.conv_id)

    # increment: x extends with exactly z's extra turns (combined x ==
    # stored z -> x is DROPPED by the vs-corpus pass, its stored text
    # stays current), and a new conversation y near-duplicates x's
    # STORED text (one word changed in one turn)
    y_texts = [BODIES["a"][0].replace("first", "initial")] + BODIES["a"][1:]
    incr = (_rows("x", Z_EXT, start_idx=len(BODIES["a"]))
            + _rows("y", y_texts))
    m = curation.run_curation_increment(
        spark, _sdf(spark, incr), out, snapshot="i1", n_buckets=2)
    # without the refinement pass y installs (n_docs == 3): x's stored
    # feature row was anti-joined off the corpus side, and y only met
    # x's NEW text (jaccard ~0.5) in the within-batch pass
    assert m["curate"]["n_docs"] == 0
    cur = curation.read_curated(spark, out).toPandas()
    assert "y" not in set(cur.conv_id)
    assert (cur.conv_id == "x").sum() == len(BODIES["a"])
    assert (cur.conv_id == "z").sum() == len(BODIES["a"]) + len(Z_EXT)


# ===========================================================================
# PASS 3 findings (review over the pass-2 fixes themselves)
# ===========================================================================

W_EXT = Z_EXT  # readability alias: the extension turns of the superset conv


def _words(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


# --------------------------------------------------------------------------
# Pass-3 finding 1: TURN-unit increment markers carry a seq, so the
# promote-intent re-run gate discriminates for turn pipelines too.
# --------------------------------------------------------------------------

def test_turn_unit_intent_retry_excludes_rerun_snapshot(spark, tmp_path):
    out = str(tmp_path / "turnbase")
    curation.run_curation(
        spark, _sdf(spark, _rows("a", BODIES["a"]) + _rows("b", BODIES["b"])),
        out, n_buckets=2, input_snapshot="s0")  # default unit='turn'
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("d", D_NOVEL)), out, snapshot="i1",
        n_buckets=2)
    m1 = _marker(spark, out, "i1")
    assert int(m1.get("seq", 0)) >= 1  # turn markers now carry seq
    fsutil.write_text(spark, _intent_path(out), json.dumps(
        {"fold": {"i1": int(m1["seq"])}, "phases": ["curated"]}))
    # re-run with different content before the retry
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("e", E_NOVEL)), out, snapshot="i1",
        n_buckets=2, resume=False)
    m2 = _marker(spark, out, "i1")
    assert int(m2["seq"]) > int(m1["seq"])

    mp = curation.promote_increments(spark, out)
    assert mp["promoted_snaps"] == []
    assert fsutil.exists(spark, f"{out}/_stages/incr-i1.json")
    assert fsutil.exists(spark, f"{out}/{curation.CURATED_INCR}/snap=i1")
    texts = set(curation.read_curated(spark, out).toPandas().clean_text)
    assert E_NOVEL[0] in texts and D_NOVEL[0] not in texts
    mp2 = curation.promote_increments(spark, out)
    assert mp2["promoted_snaps"] == ["i1"]
    texts2 = set(curation.read_curated(spark, out).toPandas().clean_text)
    assert E_NOVEL[0] in texts2 and D_NOVEL[0] not in texts2


# --------------------------------------------------------------------------
# Pass-3 finding 5: a re-run that crashes AFTER mutating trees but BEFORE
# its marker leaves the snapshot UNcommitted (no stale completed marker to
# short-circuit the retry) — the retry recomputes and converges.
# --------------------------------------------------------------------------

def test_increment_rerun_crash_before_marker_recomputes(
        spark, conv_base, monkeypatch):
    out = conv_base
    curation.run_curation_increment(
        spark, _sdf(spark, _rows("d", D_NOVEL)), out, snapshot="i1",
        n_buckets=2)

    real = curation._mark_stage

    def boom(*a, **k):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(curation, "_mark_stage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        curation.run_curation_increment(
            spark, _sdf(spark, _rows("e", E_NOVEL)), out, snapshot="i1",
            n_buckets=2, resume=False)
    monkeypatch.setattr(curation, "_mark_stage", real)

    # the prior attempt's completed marker is GONE — not a stale lie
    assert not fsutil.exists(spark, f"{out}/_stages/incr-i1.json")
    # resume retry recomputes (no skip) and installs the new content
    m = curation.run_curation_increment(
        spark, _sdf(spark, _rows("e", E_NOVEL)), out, snapshot="i1",
        n_buckets=2, resume=True)
    assert m["curate"].get("skipped") is not True
    assert m["curate"]["n_docs"] == len(E_NOVEL)
    cur = curation.read_curated(spark, out).toPandas()
    assert "e" in set(cur.conv_id) and "d" not in set(cur.conv_id)


# --------------------------------------------------------------------------
# Pass-3 finding 3: manifest cleanup must not eat a SIBLING snapshot whose
# name extends this one with a hyphen.
# --------------------------------------------------------------------------

def test_clear_stale_splits_spares_hyphen_sibling_snapshot(spark, tmp_path):
    out = str(tmp_path / "o")
    fsutil.mkdirs(spark, f"{out}/manifests")
    for name in ("incr-s1-train.json", "incr-s1-test.json",
                 "incr-s1-retry-train.json"):
        fsutil.write_text(spark, f"{out}/manifests/{name}", "{}")
    curation._clear_stale_splits(spark, out, "s1", kept_splits=())
    assert not fsutil.exists(spark, f"{out}/manifests/incr-s1-train.json")
    assert not fsutil.exists(spark, f"{out}/manifests/incr-s1-test.json")
    # snapshot 's1-retry' keeps its per-split accounting
    assert fsutil.exists(spark,
                         f"{out}/manifests/incr-s1-retry-train.json")


# --------------------------------------------------------------------------
# Pass-3 finding 2: auto-format PATH round trip — what write_transcripts
# writes by default, read_transcripts reads by default, with or without
# the Iceberg runtime on the classpath.
# --------------------------------------------------------------------------

def test_auto_path_write_read_roundtrip_with_iceberg_runtime(
        spark, tmp_path, monkeypatch):
    from epstein_browser_spark import sources

    monkeypatch.setattr(sources, "iceberg_available", lambda s: True)
    tgt = str(tmp_path / "tw")
    sources.write_transcripts(_sdf(spark, _rows("c1", ["hello there"])), tgt)
    back = sources.read_transcripts(spark, tgt)  # must NOT try iceberg
    assert back.count() == 1
    # an actual Iceberg Hadoop-table layout IS detected
    ice_dir = str(tmp_path / "icetable")
    fsutil.mkdirs(spark, f"{ice_dir}/metadata")
    assert sources._is_iceberg_path(spark, ice_dir)
    assert not sources._is_iceberg_path(spark, tgt)


# --------------------------------------------------------------------------
# Pass-3 finding 4: a refinement drop of a within-batch cluster CANONICAL
# re-elects among the cluster's members instead of losing them.
# --------------------------------------------------------------------------

def test_conv_refinement_reelects_cluster_member(spark, tmp_path):
    from pyspark.sql import functions as SF

    P = _words("p", 46)
    Q = _words("q", 50)
    Qp = Q[:-13] + _words("qx", 13)       # stored x's second turn
    Pp = _words("px", 13) + P[13:]        # z's first turn
    R = _words("r", 45)                   # w's long third turn

    # pick conv ids so the stored-x near-dup gets the SMALLER conv_uid
    # (elected canonical first -> the refinement-drop path under test)
    names = ["cand1", "cand2"]
    uids = {r["n"]: r["u"] for r in spark.createDataFrame(
        [(n,) for n in names], "n string").select(
        "n", SF.xxhash64("n").alias("u")).collect()}
    y_id = min(names, key=lambda n: uids[n])   # near stored-x
    z_id = max(names, key=lambda n: uids[n])   # near y only

    def conv(conv_id, turn_texts):
        return _rows(conv_id, [" ".join(t) for t in turn_texts])

    out = str(tmp_path / "reelect")
    curation.run_curation(
        spark, _sdf(spark, conv("x", [P, Qp]) + conv("w", [P, Qp, R])),
        out, n_buckets=2, unit="conversation", input_snapshot="s0")
    cur0 = curation.read_curated(spark, out).toPandas()
    assert {"x", "w"} <= set(cur0.conv_id)  # not near-dups at base

    # increment: x extends with w's third turn (combined x == stored w ->
    # x dropped, stored x text stays current); y near-dups STORED x;
    # z near-dups y but NOT stored x
    incr = (conv("x", [R])  # delivered at turn_idx 0 -> re-keyed below
            + conv(y_id, [P, Q]) + conv(z_id, [Pp, Q]))
    # fix x's redelivered turn index to extend, not overwrite
    for r in incr:
        if r["conv_id"] == "x":
            r["turn_idx"] = 2
    m = curation.run_curation_increment(
        spark, _sdf(spark, incr), out, snapshot="i1", n_buckets=2)
    cur = curation.read_curated(spark, out).toPandas()
    # y (canonical of the {y,z} cluster) near-matches stored x -> dropped;
    # z re-elected and installed — NOT lost with its canonical
    assert m["curate"]["n_docs"] == 2
    assert z_id in set(cur.conv_id)
    assert y_id not in set(cur.conv_id)
    assert (cur.conv_id == "x").sum() == 2      # old x text current
    assert (cur.conv_id == "w").sum() == 3
