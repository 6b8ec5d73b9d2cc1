"""Regenerate BENCH/PLANS.md: the formatted physical plans of the
headline queries, with a note on what each plan is evidence OF (pushdown,
broadcast, TakeOrderedAndProject, partitioned windows, no cartesian /
single-partition exchanges). The same properties are pinned continuously
by tests/test_plans.py and tests/test_plan_sweep.py; this file exists so
a reviewer can read the actual plans without running Spark.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = {
    "q01_pricing_summary": (
        "Scan-side pruning: PushedFilters on l_shipdate and a ReadSchema "
        "of only the aggregated columns; partial (map-side) aggregation "
        "before the single exchange."
    ),
    "q05_top_users": (
        "Global top-k compiles to TakeOrderedAndProject (per-partition "
        "heaps) — no full sort, no single-partition exchange."
    ),
    "q09_customers_no_orders": (
        "Work-remaining anti-join: BroadcastHashJoin LeftAnti with the "
        "order keys broadcast."
    ),
    "q12_pagination": (
        "Pagination without a global window: orderBy+limit prefix "
        "(TakeOrderedAndProject) then row_number under a non-foldable "
        "constant partition key — the r1 single-task WindowExec is gone."
    ),
    "q20_minhash_pairs": (
        "Near-dup scale shape: one exploded shingle pass, flat codegen "
        "min-aggregates, banded self-join with window-count bucket cap, "
        "signature prefilter, gram verify only on surviving candidates."
    ),
    "q44_sessions": (
        "session_window aggregation — partial-aggregable built-in, "
        "shuffle keyed (user, session), no custom state."
    ),
    "q62_asof_join": (
        "As-of join with ZERO join operators: union of both event "
        "families, one exchange on user_id, partition-local sort, "
        "running-frame window."
    ),
    "q63_range_join": (
        "Range join as equi-join: interval bin explode, shuffle on "
        "(user, hour-bin), exact range as post-filter — no "
        "BroadcastNestedLoopJoin over the raw range predicate."
    ),
    "q66_pq_adc_topk": (
        "PQ ADC: broadcast m*k lookup table joined to the codes, "
        "dim-independent per-vector cost, rounded-distance "
        "TakeOrderedAndProject."
    ),
    "q72_bpe_tokens": (
        "Real BPE as pure codegen: the whole merge chain (100+ literal "
        "replaces over sentinel-wrapped symbols) runs INSIDE "
        "WholeStageCodegen on the exploded words — zero Python, one "
        "partial-aggregable per-doc sum."
    ),
    "q74_ivf_kmeans_topk": (
        "Learned-quantizer IVF: the trained centroids arrive as a tiny "
        "local relation (Lloyd ran as separate decimal-sum jobs), "
        "assignment is a broadcast join, search is cell-pruned + "
        "TakeOrderedAndProject — training never appears in the serving "
        "plan."
    ),
    "q77_tfidf_topk": (
        "TF-IDF: one term explode, document frequencies as a partial-agg "
        "groupBy broadcast back onto the term counts, per-doc top-k under "
        "a doc-partitioned window — no global sort, nothing quadratic."
    ),
    "q78_winnow_fingerprints": (
        "Winnowing (MOSS): shingle hashes explode once; the rightmost-min "
        "selection is a single bigint-key min over a DOC-partitioned "
        "sliding window (hash*2^31 packing) — shuffles by doc id only."
    ),
    "q79_dsir_weights": (
        "DSIR importance weights: both distributions reduce to <=1024 "
        "hashed-bucket rows (partial-agg), the log-ratio table is a "
        "broadcast join, per-doc weight is one more partial-agg groupBy "
        "— integer micro-nat arithmetic end to end."
    ),
    "q80_semdedup": (
        "SemDeDup: k-means assignment materialized once, pair join "
        "shuffles both sides by CELL so the self-join is |cell|^2 never "
        "corpus^2; per-vector norms precomputed so the pair predicate is "
        "one fold."
    ),
    "q82_dup_spans": (
        "ExactSubstr dup spans: tokenize checkpointed once, ONE wide "
        "shuffle on the gram for the distinct-doc count, semi-join back "
        "on the same key, island merge under a doc-partitioned window."
    ),
    "q84_lm_perplexity": (
        "Bigram-LM perplexity: corpus bigram stats as window sums over "
        "the (w1,w2)/(w1) partitions of ONE count frame (no stats-table "
        "join); V and the corpus mean are scalar aggregates broadcast "
        "back — no single-partition exchange."
    ),
    "q87_nb_select": (
        "NB quality selection: the 1024-row trained ratio table is a "
        "BroadcastHashJoin onto the corpus features (class counts and "
        "totals reduce via partial aggregation first), and the global "
        "top-100 compiles to TakeOrderedAndProject — per-partition "
        "heaps, no full sort."
    ),
    "q88_lsh_recall": (
        "LSH recall telemetry: candidate and truth stages are both "
        "equi-joins (band key / shared shingle — no cartesian anywhere "
        "despite all-pairs ground-truth semantics); the one-row metrics "
        "reduce is a partial aggregate per partition before the final "
        "exchange."
    ),
    "q89_role_transitions": (
        "Role-transition matrix: ONE exchange on the conversation key "
        "feeds the lag window (partitioned windowspecdefinition — never "
        "a global window), then the bigram census is a partial "
        "aggregate whose output is bounded by |roles|²."
    ),
    "q91_conv_profile": (
        "Per-conversation profile: every per-role count is a "
        "conditional aggregate inside ONE HashAggregate pair on the "
        "conversation key — the corpus is scanned once and shuffled "
        "once; no orderBy, no second exchange."
    ),
    "q92_mojibake_repair": (
        "Encoding repair: the whole replace chain (plant + fix, a "
        "dozen string replaces) stays inside a single "
        "WholeStageCodegen over the scan — zero exchanges, zero "
        "Python; ReadSchema prunes to (doc_id, text)."
    ),
    "q93_dsir_select": (
        "DSIR Gumbel selection: the bounded log-ratio table broadcasts "
        "onto the corpus features (BroadcastHashJoin), per-doc sums are "
        "partial aggregates, and the global top-100 compiles to "
        "TakeOrderedAndProject — per-partition heaps, no full sort."
    ),
    "q95_sft_pairs": (
        "SFT pair assembly: one exchange on the conversation key, a "
        "BOUNDED window frame (ROWS 4 PRECEDING..1 PRECEDING) so "
        "per-row state is O(k), and the md5/length projection keeps "
        "the output row-bounded."
    ),
    "q96_context_budget": (
        "Context-window trimming: the reverse running sum is one "
        "partitioned window (conversation key, turn_idx DESC) — no "
        "second pass, no per-conversation collect, no global sort."
    ),
    "q97_mixture_alpha": (
        "α-sampling mixture: ONE corpus scan reduces to the "
        "≤|sources|-row per-source aggregate, localCheckpointed so the "
        "two scalar normalizers (token total, weight sum) consume the "
        "tiny ExistingRDD instead of re-inlining the corpus aggregate — "
        "every join in the plan is a broadcast over ≤|sources| rows."
    ),
    "q98_self_repetition": (
        "Assistant self-repetition: the role filter prunes BEFORE the "
        "single exchange on the conversation key; lag + array set ops "
        "all sit in one partitioned window + codegen projection — no "
        "self-join, no Python."
    ),
    "q99_tool_grounding": (
        "Tool grounding: the last-tool-text carry is last(ignorenulls) "
        "over an unbounded-preceding ROW frame inside the ONE "
        "conversation-key window shuffle; the word-overlap ratio is a "
        "pure codegen array projection — no join against the tool "
        "turns."
    ),
    "q100_episode_segments": (
        "Episode segmentation: ONE exchange on the conversation key "
        "serves BOTH windows (the ts-gap lag, then the running is-new "
        "sum — same partitioning and ordering, so no second sort or "
        "shuffle); episode ids are emitted per turn, keeping the plan "
        "single-shuffle with no aggregate."
    ),
    "q119_blocklist_gate": (
        "Word-blocklist safety gate: zero exchanges — the whole gate "
        "(tokenize, blocklist hit count, both drop policies) is one "
        "WholeStageCodegen projection over the scan; the blocklist is "
        "a literal array, not a join."
    ),
    "q121_domain_reputation": (
        "Domain reputation: the per-doc gate stays a codegen "
        "projection; the (doc,domain) dedup and the domain rollup are "
        "partial-aggregated before their exchanges, and the doc↔flag "
        "join is a broadcast (both sides are per-doc-bounded) — no "
        "cartesian, no single-partition exchange."
    ),
    "q123_domain_pagerank": (
        "Iterative PageRank SERVING plan: the 5 training rounds run "
        "before this plan exists (localCheckpoint per round, the "
        "connected-components discipline); the returned frame is the "
        "final |nodes|-sized rank table — a checkpoint scan plus "
        "TakeOrdered-free full order on ~|domains| rows, never the edge "
        "table."
    ),
    "q126_rollup_totals": (
        "ROLLUP as ONE Expand + ONE partial-aggregable exchange over a "
        "single parquet scan — three grouping sets, not three scans."
    ),
    "q128_big_spenders_semi": (
        "EXISTS planned as LeftSemi with the o_totalprice filter in "
        "PushedFilters on the orders scan; probe rows never duplicate."
    ),
    "q130_hopping_window": (
        "Hopping windows via the map-side window Expand (each event -> "
        "its two windows) feeding one partial-aggregable exchange — no "
        "self-join of the log against shifted copies."
    ),
    "q133_rolling_24h": (
        "RANGE frame over exact epoch-micros: one exchange on user_id, "
        "partition-local sort, running window — the extraction-shuffle "
        "shape with a time-span frame."
    ),
    "q122_conv_safety_drop": (
        "Conversation-atomic safety: map-only per-turn gate, then ONE "
        "partial-aggregable groupBy on the conversation key — the same "
        "single-shuffle shape as extraction, so the op scales exactly "
        "as far as the corpus scan does."
    ),
    "q144_hll_customers": (
        "HyperLogLog census: register build is a partial-aggregable "
        "max over (group, register) — map-side combine ships 256 "
        "registers per group per partition, never the raw keys; the "
        "exact-baseline join is a BroadcastHashJoin of the "
        "|groups|-sized audit side."
    ),
    "q145_cms_heavyhitters": (
        "Count-min: the grid build is ONE partial-aggregable exchange "
        "with <=1024 groups; probes are a BroadcastHashJoin of the "
        "grid against the 20-row (localCheckpoint-pinned) candidate "
        "set — the fact table shuffles once for the exact baseline, "
        "zero times for the sketch probe."
    ),
    "q146_doc_skyline": (
        "Skyline: the exact dominance check is a SortMergeJoin "
        "LeftAnti on the x-bin EQUI key with the dominance predicate "
        "as a residual — AQE-splittable, never a CartesianProduct; "
        "the suffix-max prefilter arrives as a BroadcastHashJoin of "
        "<=256 bin rows against the localCheckpoint-pinned points."
    ),
    "q147_bloom_semijoin": (
        "Bloom semi-join: the filter is a BroadcastExchange of the "
        "distinct dim-key bit positions (<=512 rows); orders probe it "
        "with a BroadcastHashJoin — the fact table never shuffles on "
        "the join key; the exact audit join is likewise broadcast."
    ),
    "q148_org_hierarchy": (
        "Recursive closure (pointer doubling): each settled round is "
        "an equi-join of the localCheckpoint-pinned state with itself; "
        "the final census is one partial-aggregable groupBy — the "
        "explain shows the LAST round's join over the checkpointed "
        "RDD scan (lineage truncated by design, the CC/pagerank "
        "discipline)."
    ),
    "q150_table_fingerprint": (
        "Replica fingerprint: map-only md5 + ONE partial-aggregable "
        "exchange with |statuses| groups; the DECIMAL(38,0) partial "
        "sums keep the checksum exact at any row count."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from epstein_browser_spark.queries import QUERIES
    from epstein_browser_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    out = [
        "# Physical-plan evidence (generated by tools/dump_plans.py)\n",
        "\nPlans below are `df.explain('formatted')` output at "
        f"`{sf_dir}`. The properties called out per query are pinned "
        "continuously by tests/test_plans.py and the registry-wide sweep "
        "in tests/test_plan_sweep.py (no CartesianProduct, no Exchange "
        "SinglePartition anywhere).\n",
    ]
    for name, why in SHOWCASE.items():
        fn, _sql = QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + the first detail blocks, cap the size
        out.append(f"\n## {name}\n\n{why}\n\n```\n{plan[:4000]}\n```\n")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote BENCH/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
