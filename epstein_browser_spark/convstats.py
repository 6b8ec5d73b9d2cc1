"""Conversation/agent-transcript analytics over the north-rule input shape
(conv_id, turn_idx, role, text, tool, ts).

The reference rolls its corpus up the same three ways for its dashboards —
grouped censuses over a category column (/root/reference/app.py:515-566:
top pages / referrers / popular searches), per-container profiles
(/root/reference/app.py:886-915: per-volume counts + OCR coverage), and
ordered-sequence views (navigation prev/next). These are the transcript-
payload analogs a dialog-training pipeline filters and reports on: the
role-transition matrix (is the dialog well-formed?), the tool-call census
(which tools, how chatty, how error-prone?), and the per-conversation
profile (the row a curation gate keeps or drops whole dialogs by).

Everything here is pure JVM column expressions — no Python in the hot
path. Each op is one window and/or one partial-agg shuffle; outputs are
bounded by the category domain (roles², tools) or by conversation count,
so nothing returns corpus-sized results except conv_profile, which is a
straight groupBy on the natural key the table is already hash-laid-out by
at 10^12-turn scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from epstein_browser_spark import textstats

START_ROLE = "start"  # synthetic prev_role for each conversation's first turn


def role_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """(prev_role, role, n_transitions, n_convs) — the conversation-flow
    bigram matrix. A conversation's first turn transitions from the
    synthetic ``start`` role, so column sums over ``prev_role='start'``
    equal the conversation count and the full matrix sums to the turn
    count (both pinned by tests).

    Scale shape: one shuffle on ``conv_col`` for the lag window (the hash
    layout a transcript table is already partitioned by), then a
    partial-agg groupBy that reduces to ≤ (|roles|+1)·|roles| rows —
    map-side combine does almost all the work, the final exchange moves
    a few dozen rows per partition."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    lagged = df.select(
        F.col(conv_col).alias("conv_id"),
        F.coalesce(F.lag(role_col).over(w), F.lit(START_ROLE)).alias(
            "prev_role"
        ),
        F.col(role_col).alias("role"),
    )
    return (
        lagged.groupBy("prev_role", "role")
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy("prev_role", "role")
    )


def tool_census(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    text_col: str = "text",
    error_marker: str = "error:",
) -> DataFrame:
    """(tool, n_calls, n_convs, avg_result_chars, error_rate) — per-tool
    usage census over the tool-result turns (``role='tool'``): call and
    conversation counts, mean result length, and the fraction of results
    whose text carries ``error_marker`` (case-insensitive prefix-anywhere
    match, the cheap JVM `contains`; a NULL result counts as non-error,
    so the rate's denominator is ALL calls — the SQL `CASE ... ELSE 0`
    semantics).

    Scale shape: the role filter prunes before the shuffle; one
    partial-agg groupBy bounded by the tool vocabulary (dozens)."""
    calls = df.filter(F.col(role_col) == "tool").select(
        F.col(tool_col).alias("tool"),
        F.col(conv_col).alias("conv_id"),
        F.length(text_col).alias("n_chars"),
        F.coalesce(
            F.lower(F.col(text_col)).contains(error_marker.lower()),
            F.lit(False),
        ).alias("is_error"),
    )
    return (
        calls.groupBy("tool")
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.avg("n_chars"), 4).alias("avg_result_chars"),
            F.round(
                F.avg(F.col("is_error").cast("double")), 6
            ).alias("error_rate"),
        )
        .orderBy("tool")
    )


def conv_profile(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per conversation: the shape/health scalars a dialog
    curation gate keeps or drops whole conversations by — turn counts by
    role, tool diversity, assistant verbosity, wall-clock span, and the
    well-formedness flags (has a system prompt; has at least one
    assistant turn).

    Scale shape: a single partial-agg groupBy on the conversation key —
    every per-role count is a conditional sum inside the same aggregate,
    so the corpus is read once and shuffled once (on the key the table
    is already laid out by)."""
    def n_role(r: str) -> Column:
        return F.sum(F.when(F.col(role_col) == r, 1).otherwise(0))

    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            n_role("user").alias("n_user"),
            n_role("assistant").alias("n_assistant"),
            n_role("tool").alias("n_tool_calls"),
            F.countDistinct(tool_col).alias("n_distinct_tools"),
            F.sum(
                F.when(
                    F.col(role_col) == "assistant", F.length(text_col)
                ).otherwise(0)
            ).alias("assistant_chars"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("span_seconds"),
            F.max(
                (F.col(role_col) == "system").cast("int")
            ).cast("boolean").alias("has_system"),
            F.max(
                (F.col(role_col) == "assistant").cast("int")
            ).cast("boolean").alias("has_assistant"),
        )
        # no orderBy: this is the one corpus-sized output here, and an
        # ordering would add a full range-shuffle no consumer needs
    )


def pack_conversations(
    df: DataFrame,
    budget: int = 2048,
    conv_col: str = "conv_id",
    text_col: str = "text",
    shard_col: Column | None = None,
    n_shards: int = 16,
) -> DataFrame:
    """Conversation-ATOMIC sequence packing: whole dialogs are assigned to
    fixed-token-budget training sequences (a dialog never splits across
    sequences — the fine-tuning counterpart of textstats.pack_sequences'
    GPT concat-and-chunk, where straddling is fine). Token counts are
    whitespace tokens summed per conversation; packing then reuses the
    sharded running-sum assignment so no task ever sorts the corpus.

    Returns (conv_id, n_tokens, shard, cum_tokens, seq_in_shard)."""
    conv_toks = df.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.sum(textstats.token_count(F.col(text_col)))
        .cast("long")
        .alias("n_tokens")
    )
    packed = textstats.pack_sequences(
        conv_toks,
        token_col="n_tokens",
        budget=budget,
        shard_col=shard_col,
        order_cols=("conv_id",),
        n_shards=n_shards,
    )
    return packed.select(
        "conv_id",
        "n_tokens",
        "shard",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("seq_in_shard").cast("long").alias("seq_in_shard"),
    )


def sft_pairs(
    df: DataFrame,
    k_context: int = 4,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, turn_idx, n_context_chars, context_md5, n_target_chars,
    target_md5) — the SFT example builder: every assistant turn becomes a
    training pair of (the last ``k_context`` preceding turns rendered as
    ``role: text`` lines, the assistant text). Emits lengths + md5s
    rather than the assembled strings so the operator's OUTPUT stays
    row-bounded while the assembly itself is still value-checked
    end-to-end (the q54 redacted-text pattern).

    Scale shape: one window shuffle on the conversation key; the bounded
    ``ROWS BETWEEN k PRECEDING AND 1 PRECEDING`` frame keeps per-row
    work O(k·turn_chars) — the unbounded-context variant would be
    O(conversation²) and is deliberately not offered. An empty frame
    (nothing precedes the first turn) yields no pair, matching SQL's
    NULL string_agg."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-k_context, -1)
    )
    ctx_list = F.collect_list(
        F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    ).over(w)
    ctx = F.when(F.size(ctx_list) > 0, F.concat_ws("\n", ctx_list))
    return (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col(role_col).alias("role"),
            F.col(text_col).alias("text"),
            ctx.alias("_ctx"),
        )
        .filter((F.col("role") == "assistant") & F.col("_ctx").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.length("_ctx").cast("long").alias("n_context_chars"),
            F.md5("_ctx").alias("context_md5"),
            F.length("text").cast("long").alias("n_target_chars"),
            F.md5("text").alias("target_md5"),
        )
    )


def context_budget_suffix(
    df: DataFrame,
    budget: int = 512,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, turn_idx, n_tokens, rev_cum_tokens, keep) — context-window
    trimming: keep the maximal SUFFIX of each conversation's turns whose
    whitespace-token total fits ``budget`` (what an example builder or
    serving stack does when a dialog outgrows the model's context). The
    reverse running sum is one window over the conversation key ordered
    by ``turn_idx`` DESC — no second pass, no per-conv collect."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        textstats.token_count(F.col(text_col)).cast("long")
        .alias("n_tokens"),
    )
    rev_cum = F.sum("n_tokens").over(w)
    return toks.select(
        "conv_id",
        "turn_idx",
        "n_tokens",
        rev_cum.cast("long").alias("rev_cum_tokens"),
        (rev_cum <= budget).alias("keep"),
    )


def self_repetition(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, prev_turn_idx, n_common_words, jaccard) —
    consecutive same-role turn similarity: for every ``role`` turn that
    has an earlier ``role`` turn in the same conversation, the distinct-
    word Jaccard against that previous turn. The agent-transcript "model
    is repeating itself" detector (high consecutive-assistant-turn
    overlap is the dialog analog of the reference's within-document
    repetition flags, /root/reference/helpers/error_detection.py:64-93)
    — a curation gate drops or down-weights loops this surfaces.

    Scale shape: the role filter prunes before the shuffle, one window
    on the conversation key for ``lag``, then pure JVM array set ops
    (array_intersect/array_union on per-turn distinct word arrays) — no
    self-join, no UDF, output ≤ one row per kept turn."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    toks = df.filter(F.col(role_col) == role).select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.array_distinct(textstats.tokens(F.col(text_col))).alias("_w"),
    )
    lagged = toks.select(
        "conv_id",
        "turn_idx",
        F.lag("turn_idx").over(w).alias("prev_turn_idx"),
        "_w",
        F.lag("_w").over(w).alias("_pw"),
    ).filter(F.col("prev_turn_idx").isNotNull())
    inter = F.size(F.array_intersect("_w", "_pw"))
    union = F.size(F.array_union("_w", "_pw"))
    return lagged.select(
        "conv_id",
        "turn_idx",
        "prev_turn_idx",
        inter.cast("long").alias("n_common_words"),
        F.when(union > 0, F.round(inter / union, 6))
        .otherwise(F.lit(0.0)).alias("jaccard"),
    )


def tool_grounding(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, turn_idx, n_words, n_grounded, grounding) — for every
    assistant turn preceded by a tool result in its conversation, the
    fraction of the turn's distinct words that appear in the MOST RECENT
    tool result: the cheap faithfulness/grounding proxy a RAG- or
    agent-transcript curation pipeline scores responses with (a
    grounded answer reuses the evidence's vocabulary; a hallucinated
    one doesn't). Assistant turns with no preceding tool result are out
    of scope (no row), mirroring q95's ctx IS NOT NULL convention.

    Scale shape: one window on the conversation key carries the last
    tool text forward (``last(..., ignorenulls)`` over an unbounded-
    preceding row frame — assistant rows are never ``role='tool'``, so
    including the current row is safe), then JVM array set ops per row.
    No join: the carry is O(turns) state inside the one shuffle the
    table is already laid out for."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.array_distinct(textstats.tokens(F.col(text_col))).alias("_w"),
        F.last(
            F.when(F.col(role_col) == "tool", F.col(text_col)),
            ignorenulls=True,
        ).over(w).alias("_tool_text"),
    ).filter(
        (F.col("role") == "assistant") & F.col("_tool_text").isNotNull()
    )
    tw = F.array_distinct(textstats.tokens(F.col("_tool_text")))
    n_words = F.size("_w")
    n_grounded = F.size(F.array_intersect(F.col("_w"), tw))
    return carried.select(
        "conv_id",
        "turn_idx",
        n_words.cast("long").alias("n_words"),
        n_grounded.cast("long").alias("n_grounded"),
        F.when(n_words > 0, F.round(n_grounded / n_words, 6))
        .otherwise(F.lit(0.0)).alias("grounding"),
    )


def turn_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation ingest-integrity gate: duplicate turn indices,
    holes in the index sequence, and timestamp regressions — the
    validation row a transcript pipeline drops or quarantines dialogs by
    BEFORE any extraction or dedup runs (a hole means a lost turn; a
    duplicate means a double delivery the exact-dedup stage would
    otherwise canonicalize arbitrarily; a ts regression means the
    ordering key and the wall clock disagree).

    ``n_dup_idx`` counts rows beyond the first per index value;
    ``n_missing_idx`` counts holes in ``[min_idx, max_idx]``;
    ``n_ts_regress`` counts turns whose timestamp precedes the previous
    turn's under the total ``(idx, ts)`` order (deterministic even with
    duplicated indices, since ts breaks the tie). ``is_valid`` is the
    all-clear conjunction.

    Scale shape: ONE exchange on the conversation key serves both the
    lag window and the final groupBy (same partitioning, so Catalyst
    plans a single shuffle); output is one row per conversation.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col, ts_col)
    lagged = df.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("_idx"),
        F.col(ts_col).alias("_ts"),
        F.lag(ts_col).over(w).alias("_prev_ts"),
    )
    regress = (
        F.col("_prev_ts").isNotNull() & (F.col("_ts") < F.col("_prev_ts"))
    ).cast("long")
    per = lagged.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.countDistinct("_idx").cast("long").alias("_n_distinct"),
        F.min("_idx").cast("long").alias("_min_idx"),
        F.max("_idx").cast("long").alias("_max_idx"),
        F.sum(regress).cast("long").alias("n_ts_regress"),
    )
    n_dup = F.col("n_turns") - F.col("_n_distinct")
    n_missing = (
        F.col("_max_idx") - F.col("_min_idx") + 1 - F.col("_n_distinct")
    )
    return per.select(
        "conv_id",
        "n_turns",
        n_dup.cast("long").alias("n_dup_idx"),
        n_missing.cast("long").alias("n_missing_idx"),
        "n_ts_regress",
        ((n_dup == 0) & (n_missing == 0) & (F.col("n_ts_regress") == 0))
        .alias("is_valid"),
    )


def template_turns(df: DataFrame, text_col: str = "text",
                   role_col: str = "role",
                   conv_col: str = "conv_id",
                   min_occurrences: int = 2) -> DataFrame:
    """Canned-response / template-turn census: exact turn texts repeated
    ``min_occurrences``+ times across the corpus, per role — the
    dialog-curation report behind stripping templated refusals, system-
    prompt echoes, and copy-pasted tool boilerplate before SFT (a turn
    that appears verbatim in hundreds of conversations teaches the
    model the template, not the behavior). Exact match on purpose: the
    NEAR-dup analogues are q75/q76 (conversation granularity) and q98
    (consecutive-turn similarity); the exact census is the cheap first
    pass that catches the overwhelming bulk.

    Output per (role, text_md5): occurrence count, distinct
    conversations touched, turn length. The text itself ships only as
    md5 + length (the q42/q54 discipline: value-check without shipping
    the corpus). ONE partial-agg groupBy keyed by (role, md5) — repeats
    collapse map-side, so the shuffle carries one row per distinct
    turn text, not per turn."""
    census = (
        df.groupBy(
            F.col(role_col).alias("role"),
            F.md5(F.col(text_col)).alias("text_md5"),
            F.length(F.col(text_col)).cast("long").alias("turn_len"),
        )
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct(F.col(conv_col)).cast("long").alias("n_convs"),
        )
    )
    return census.filter(F.col("n_occurrences") >= min_occurrences)
