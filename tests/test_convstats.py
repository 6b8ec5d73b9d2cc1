"""Unit invariants for the agent-transcript analytics (convstats), the
encoding-repair chain, DSIR Gumbel selection, and conversation-atomic
packing — the value-level cross-engine checks live in
tests/test_queries_oracle.py (q89–q94)."""

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import convstats, textstats
from epstein_browser_spark.queries import _derived_agent_transcripts


@pytest.fixture(scope="module")
def tr(spark, sf_dir):
    df = _derived_agent_transcripts(spark, sf_dir).cache()
    df.count()
    yield df
    df.unpersist()


def test_role_transitions_mass_conservation(spark, tr):
    """The bigram matrix sums to the turn count, and the 'start' rows sum
    to the conversation count (every conversation enters exactly once)."""
    out = convstats.role_transitions(tr).collect()
    n_turns = tr.count()
    n_convs = tr.select("conv_id").distinct().count()
    assert sum(r.n_transitions for r in out) == n_turns
    start_rows = [r for r in out if r.prev_role == convstats.START_ROLE]
    assert sum(r.n_transitions for r in start_rows) == n_convs
    # n_convs per cell never exceeds the transition count
    assert all(r.n_convs <= r.n_transitions for r in out)


def test_tool_census_only_tool_turns(spark, tr):
    out = convstats.tool_census(tr).collect()
    n_tool_turns = tr.filter(F.col("role") == "tool").count()
    assert sum(r.n_calls for r in out) == n_tool_turns
    assert all(r.tool is not None for r in out)
    assert all(0.0 <= r.error_rate <= 1.0 for r in out)
    # the planted error slice (doc_id%7==3 and %11==0) exists → nonzero
    assert any(r.error_rate > 0 for r in out)


def test_conv_profile_partition_invariance(spark, tr):
    """One row per conversation; counts conserve mass; identical under a
    different input layout (the aggregate must not depend on row order)."""
    out = convstats.conv_profile(tr)
    rows = {r.conv_id: r for r in out.collect()}
    assert len(rows) == tr.select("conv_id").distinct().count()
    assert sum(r.n_turns for r in rows.values()) == tr.count()
    r0 = rows["c0"]
    assert r0.has_system and r0.has_assistant
    assert r0.n_turns == r0.n_user + r0.n_assistant + r0.n_tool_calls + 1
    relaid = convstats.conv_profile(tr.repartition(7, "turn_idx"))
    assert {tuple(r) for r in relaid.collect()} == {
        tuple(r) for r in rows.values()
    }


def test_fix_mojibake_roundtrip_and_idempotence(spark):
    """sloppy-cp1252 corruption of a clean string repairs back exactly,
    and repairing already-clean text is a no-op (no fix's output re-forms
    another fix's input)."""
    clean = "café “quoted” — naïve’s resumé ends"
    # corrupt only chars our chain covers (ï is deliberately NOT in it)
    bad = {g: b for b, g in textstats.MOJIBAKE_FIXES}
    corrupt = clean
    for good, badseq in bad.items():
        corrupt = corrupt.replace(good, badseq)
    df = spark.createDataFrame([(corrupt,), (clean,)], ["text"])
    fixed = df.select(
        textstats.fix_mojibake(F.col("text")).alias("f")
    ).collect()
    assert fixed[0].f == clean
    assert fixed[1].f == clean  # idempotent on clean text
    # double application == single application
    twice = df.select(
        textstats.fix_mojibake(
            textstats.fix_mojibake(F.col("text"))
        ).alias("f")
    ).collect()
    assert [r.f for r in twice] == [r.f for r in fixed]


def test_mojibake_census_flags(spark):
    df = spark.createDataFrame(
        [(0, "plain ascii"), (1, "broken " + "’".encode("utf-8").decode("cp1252"))],
        ["doc_id", "text"],
    )
    out = {r.id: r for r in textstats.mojibake_census(df).collect()}
    assert not out[0].was_mojibake
    assert out[0].chars_before == out[0].chars_after
    assert out[1].was_mojibake
    assert out[1].chars_before - out[1].chars_after == 2  # 3 chars → 1


def test_dsir_select_deterministic_and_seeded(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = d.filter(F.col("lang") == "en")
    a = textstats.dsir_select(d, tgt, k=50, seed="s1").collect()
    b = textstats.dsir_select(d, tgt, k=50, seed="s1").collect()
    assert [r.id for r in a] == [r.id for r in b]  # reproducible epoch
    assert len(a) == 50
    c = textstats.dsir_select(d, tgt, k=50, seed="s2").collect()
    assert {r.id for r in c} != {r.id for r in a}  # a new seed redraws
    # Gumbel perturbs but weight dominates on average: the selected set's
    # mean log-weight must beat the corpus mean
    lw = textstats.dsir_logweights(d, tgt)
    corpus_mean = lw.agg(F.avg("log_weight")).first()[0]
    sel_mean = sum(r.log_weight for r in a) / len(a)
    assert sel_mean > corpus_mean


def test_pack_conversations_atomic(spark, tr):
    """Every conversation appears exactly once (dialogs never split), the
    running sum is consistent per shard, and the assignment is invariant
    to the input layout."""
    out = convstats.pack_conversations(tr, budget=256, n_shards=4)
    rows = out.collect()
    convs = [r.conv_id for r in rows]
    assert len(convs) == len(set(convs))
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.conv_id)):
        prev = by_shard.get(r.shard, 0)
        assert r.cum_tokens == prev + r.n_tokens
        by_shard[r.shard] = r.cum_tokens
        assert r.seq_in_shard == (r.cum_tokens - r.n_tokens) // 256
    relaid = convstats.pack_conversations(
        tr.repartition(5, "text"), budget=256, n_shards=4
    )
    assert {tuple(r) for r in relaid.collect()} == {tuple(r) for r in rows}


def test_sft_pairs_assembly(spark):
    """Context is the last-k preceding turns in turn order, rendered
    'role: text'; turns with an empty frame produce no pair."""
    import hashlib

    rows = [
        ("a", 0, "system", "sys"),
        ("a", 1, "user", "u1"),
        ("a", 2, "assistant", "a2"),
        ("a", 3, "user", "u3"),
        ("a", 4, "assistant", "a4"),
        ("b", 0, "assistant", "orphan"),  # empty frame → no pair
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {(r.conv_id, r.turn_idx): r
           for r in convstats.sft_pairs(df, k_context=2).collect()}
    assert set(out) == {("a", 2), ("a", 4)}
    ctx_a2 = "system: sys\nuser: u1"
    ctx_a4 = "assistant: a2\nuser: u3"
    assert out[("a", 2)].context_md5 == hashlib.md5(
        ctx_a2.encode()).hexdigest()
    assert out[("a", 2)].n_context_chars == len(ctx_a2)
    assert out[("a", 4)].context_md5 == hashlib.md5(
        ctx_a4.encode()).hexdigest()
    assert out[("a", 4)].target_md5 == hashlib.md5(b"a4").hexdigest()


def test_context_budget_suffix_maximal(spark):
    """keep marks exactly the maximal suffix fitting the budget, and the
    kept suffix is contiguous through the last turn."""
    rows = [
        ("a", 0, "w " * 300),  # 300 tokens
        ("a", 1, "w " * 200),
        ("a", 2, "w " * 200),
        ("a", 3, "w " * 100),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = {r.turn_idx: r
           for r in convstats.context_budget_suffix(df, budget=512).collect()}
    # suffix sums: t3=100, t2=300, t1=500 (≤512, kept), t0=800 (over)
    assert [out[i].keep for i in range(4)] == [False, True, True, True]
    assert out[3].rev_cum_tokens == 100
    assert out[2].rev_cum_tokens == 300
    assert out[1].rev_cum_tokens == 500
    assert out[0].rev_cum_tokens == 800


def test_tool_census_null_text_and_marker_case(spark):
    """NULL tool results count as non-error with the full-call denominator
    (SQL CASE ELSE 0 semantics), the marker matches case-insensitively in
    both directions, and the conversation key is parameterizable."""
    rows = [
        ("a", "tool", "grep", "ERROR: boom"),
        ("a", "tool", "grep", None),
        ("b", "tool", "grep", "fine"),
        ("b", "user", None, "not a call"),
    ]
    df = spark.createDataFrame(rows, ["sess", "role", "tool", "text"])
    out = {r.tool: r
           for r in convstats.tool_census(
               df, conv_col="sess", error_marker="Error:").collect()}
    g = out["grep"]
    assert g.n_calls == 3 and g.n_convs == 2
    assert g.error_rate == round(1 / 3, 6)  # NULL counts in the denominator


def test_self_repetition_hand_computed(spark):
    """Jaccard over DISTINCT words between consecutive same-role turns;
    non-assistant turns neither emit rows nor break the chain; the first
    assistant turn of a conversation emits nothing."""
    rows = [
        ("a", 0, "assistant", "x y z"),
        ("a", 1, "user", "noise noise"),         # skipped, not a break
        ("a", 2, "assistant", "x y q"),          # vs turn 0: |∩|=2 |∪|=4
        ("a", 3, "assistant", "x x x"),          # vs turn 2: |∩|=1 |∪|=3
        ("b", 0, "assistant", "solo"),           # no predecessor → no row
        ("c", 0, "assistant", ""),               # empty-token edge
        ("c", 1, "assistant", ""),               # ∪=0 → jaccard 0.0
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {(r.conv_id, r.turn_idx): r
           for r in convstats.self_repetition(df).collect()}
    assert set(out) == {("a", 2), ("a", 3), ("c", 1)}
    assert out[("a", 2)].prev_turn_idx == 0
    assert out[("a", 2)].n_common_words == 2
    assert out[("a", 2)].jaccard == 0.5
    assert out[("a", 3)].n_common_words == 1
    assert out[("a", 3)].jaccard == round(1 / 3, 6)
    assert out[("c", 1)].n_common_words == 0
    assert out[("c", 1)].jaccard == 0.0


def test_self_repetition_layout_invariance(spark, tr):
    base = {tuple(r) for r in convstats.self_repetition(tr).collect()}
    relaid = convstats.self_repetition(tr.repartition(7, "turn_idx"))
    assert {tuple(r) for r in relaid.collect()} == base
    assert len(base) > 0


def test_tool_grounding_hand_computed(spark):
    """Grounding is against the MOST RECENT tool result only; assistant
    turns before any tool result emit no row; words are de-duplicated."""
    rows = [
        ("a", 0, "assistant", "pre tool"),       # no tool yet → no row
        ("a", 1, "tool", "alpha beta gamma"),
        ("a", 2, "assistant", "alpha beta zeta"),   # 2/3 grounded
        ("a", 3, "tool", "delta"),
        ("a", 4, "assistant", "alpha delta"),       # vs 'delta' only: 1/2
        ("a", 5, "user", "alpha"),                  # wrong role → no row
        ("b", 0, "tool", "only evidence"),
        ("b", 1, "assistant", "evidence evidence"),  # distinct → 1/1
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {(r.conv_id, r.turn_idx): r
           for r in convstats.tool_grounding(df).collect()}
    assert set(out) == {("a", 2), ("a", 4), ("b", 1)}
    assert out[("a", 2)].n_words == 3
    assert out[("a", 2)].n_grounded == 2
    assert out[("a", 2)].grounding == round(2 / 3, 6)
    assert out[("a", 4)].n_grounded == 1   # 'alpha' is stale evidence now
    assert out[("a", 4)].grounding == 0.5
    assert out[("b", 1)].n_words == 1
    assert out[("b", 1)].grounding == 1.0


def test_tool_grounding_scope_matches_tool_turns(spark, tr):
    """Every emitted row is an assistant turn with ≥1 earlier tool turn in
    its conversation (q95's ctx-IS-NOT-NULL convention), and ratios are
    well-formed."""
    out = convstats.tool_grounding(tr).collect()
    assert len(out) > 0
    first_tool = {
        r.conv_id: r.t for r in tr.filter(F.col("role") == "tool")
        .groupBy("conv_id").agg(F.min("turn_idx").alias("t")).collect()
    }
    for r in out:
        assert r.conv_id in first_tool
        assert r.turn_idx > first_tool[r.conv_id]
        assert 0.0 <= r.grounding <= 1.0
        assert r.n_grounded <= r.n_words


def test_episode_segments_invariants(spark, sf_dir):
    """q100: episode ids start at 1, are non-decreasing in turn order,
    and increment exactly where the (jittered) gap exceeds 60 minutes;
    the synthetic jitter actually exercises both sides of the threshold."""
    from epstein_browser_spark.queries import q100_episode_segments

    rows = sorted(
        q100_episode_segments(spark, sf_dir).collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    assert len(rows) > 0
    prev = {}
    max_ep = 1
    for r in rows:
        if r.conv_id not in prev:
            assert r.gap_minutes is None and r.episode == 1
        else:
            p = prev[r.conv_id]
            assert 28 <= r.gap_minutes <= 72
            expected = p.episode + (1 if r.gap_minutes > 60 else 0)
            assert r.episode == expected
        prev[r.conv_id] = r
        max_ep = max(max_ep, r.episode)
    assert max_ep >= 2  # the threshold splits somewhere — not vacuous
