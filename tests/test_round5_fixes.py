"""Regression tests for the round-5 ADVICE/VERDICT fixes:

* conversation exact identity is turn-BOUNDARY-SAFE (conv_key digest
  chain, not md5 of the '\\n'-joined text) — ADVICE r4;
* a base re-run leaves NO ghost rows in the snap=base band index —
  ADVICE r4 (medium): dynamic partition overwrite only replaced the
  pbands present in the new batch;
* q09 is non-vacuous at every shipped sf — VERDICT r4 item 6.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from epstein_browser_spark import curation


def _turn_rows(rows):
    """rows: list of (conv_id, turn_idx, text)."""
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": pd.array([None] * len(rows), dtype="string"),
            "ts": pd.to_datetime(["2024-03-01 00:00:00"] * len(rows)),
        }
    )


class TestConversationBoundarySafety:
    def test_conv_key_distinguishes_turn_boundaries(self, spark):
        """['a\\nb'] and ['a', 'b'] produce the SAME conv_text (the
        newline join is ambiguous) but DIFFERENT conv_key — exact dedup
        must not collapse two genuinely different conversations."""
        tr = spark.createDataFrame(_turn_rows([
            ("one_turn", 0, "alpha line\nbeta line"),
            ("two_turns", 0, "alpha line"),
            ("two_turns", 1, "beta line"),
        ]))
        convs = curation.conversation_docs(tr, text_col="text").toPandas()
        by_id = convs.set_index("conv_id")
        assert (by_id.loc["one_turn", "conv_text"]
                == by_id.loc["two_turns", "conv_text"])  # the ambiguity
        assert (by_id.loc["one_turn", "conv_key"]
                != by_id.loc["two_turns", "conv_key"])   # the fix

        kept = curation.conversation_exact_kept(
            curation.conversation_docs(tr, text_col="text")
        ).toPandas()
        assert sorted(kept["conv_id"]) == ["one_turn", "two_turns"]

    def test_conv_key_still_collapses_true_duplicates(self, spark):
        tr = spark.createDataFrame(_turn_rows([
            ("orig", 0, "first turn body"), ("orig", 1, "second turn body"),
            ("copy", 0, "first turn body"), ("copy", 1, "second turn body"),
            ("other", 0, "a different conversation entirely"),
        ]))
        kept = curation.conversation_exact_kept(
            curation.conversation_docs(tr, text_col="text")
        ).toPandas()
        assert len(kept) == 2
        assert len({"orig", "copy"} & set(kept["conv_id"])) == 1
        assert "other" in set(kept["conv_id"])

    def test_conv_key_order_independent_of_delivery(self, spark):
        """conv_key depends only on (turn_idx, text) content, not row
        order or partitioning."""
        rows = [("c", i, f"turn body number {i} with words") for i in range(6)]
        a = curation.conversation_docs(
            spark.createDataFrame(_turn_rows(rows)), text_col="text"
        ).toPandas()
        b = curation.conversation_docs(
            spark.createDataFrame(_turn_rows(rows[::-1])).repartition(5),
            text_col="text",
        ).toPandas()
        assert a.loc[0, "conv_key"] == b.loc[0, "conv_key"]
        assert a.loc[0, "conv_text"] == b.loc[0, "conv_text"]


class TestBaseBandIndexNoGhosts:
    def test_base_rerun_clears_stale_pbands(self, spark, tmp_path):
        """Recurating a SMALLER corpus under a new input snapshot must
        leave a snap=base band index whose ids are exactly the new
        feature table's ids — the dynamic (snap, pband) overwrite alone
        kept the old corpus's rows in every pband the new run didn't
        write, inflating probe buckets past max_bucket (r4 ADVICE)."""
        texts = [
            f"document number {i} describes shipment {i * 7} of catalogued "
            f"archive boxes with inventory tag {i * 13} and routing notes "
            f"prepared by clerk {i % 5} during the spring audit season"
            for i in range(30)
        ]
        big = spark.createDataFrame(_turn_rows(
            [(f"c{i}", 0, t) for i, t in enumerate(texts)]))
        out = str(tmp_path / "cur")
        curation.run_curation(spark, big, out, n_buckets=2,
                              input_snapshot="v1")
        bands_dir = f"{out}/{curation.BANDS_DIR}"
        ids_v1 = {r["id"] for r in spark.read.parquet(bands_dir)
                  .select("id").distinct().collect()}
        assert len(ids_v1) == 30

        small = spark.createDataFrame(_turn_rows(
            [(f"c{i}", 0, t) for i, t in enumerate(texts[:5])]))
        curation.run_curation(spark, small, out, n_buckets=2,
                              input_snapshot="v2")
        spark.catalog.refreshByPath(bands_dir)
        band_ids = {r["id"] for r in spark.read.parquet(bands_dir)
                    .select("id").distinct().collect()}
        feat_ids = {r["id"] for r in
                    spark.read.parquet(f"{out}/_scratch/minhash")
                    .select("id").distinct().collect()}
        assert band_ids == feat_ids  # no ghosts from the v1 corpus
        assert len(band_ids) == 5


def test_q09_non_vacuous(spark, sf_dir):
    from epstein_browser_spark.queries import QUERIES

    fn, _sql = QUERIES["q09_customers_no_orders"]
    assert fn(spark, sf_dir).count() > 0
