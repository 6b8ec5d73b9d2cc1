"""Deterministic synthetic `transcripts` corpus (seed=42).

Shape is the authoritative input_hint schema:
  transcripts(conv_id: string, turn_idx: int, role: string,
              text: string, tool: string, ts: timestamp)

Two generators:

* :func:`make_transcripts_pdf` — rich pandas corpus for unit tests and
  golden-fixture generation. Covers every content class from FIXTURES.md §1
  (each maps to a reference-tested branch: clean prose, spanful blocks with
  sub-threshold confidences, HTML boilerplate, PDF layout, and the full
  quality-failure taxonomy of /root/reference/helpers/error_detection.py:126-180
  and /root/reference/helpers/ocr_quality_assessment.py:251-335).
* :func:`synth_transcripts_spark` — distributed generator built from
  ``spark.range`` + column expressions only (no driver-side row loop), used
  by the benchmark so corpus construction scales with the cluster. Fully
  deterministic in (id), hence identical at any parallelism.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42

_WORDS = (
    "the quick brown fox jumps over lazy dog while seventeen counsel "
    "exhibits were entered into evidence during deposition testimony "
    "regarding flight manifests and property records from the island "
    "alongside financial statements bank transfers and scheduling notes"
).split()

_ROLES = ["user", "assistant", "tool", "system"]

# quality-failure payloads, one per reference-tested branch (FIXTURES.md §1)
_NOISE_PAYLOADS = [
    "",                                  # empty
    "   ",                               # whitespace-only
    "0 0 00 0",                          # zeros garbage
    "hi",                                # too short
    "@@@@ #### $$$$ %%%%",               # mostly_non_alphabetic
    "qqqqqqqqqqqqqqqqqqqq",              # excessive_character_repetition
    "a b c d e f g h i j",               # gibberish_short_words
    "qqqq wwww eeee",                    # ocr_failure_pattern (stuck keys)
    "asdf qwer zxcv",                    # ocr_failure_pattern (keyboard)
    "!@#$%^&*()!@#$%^&*()",              # excessive_special_characters
    "{{{{||||}}}}~~~~````^^^^[[[[]]]]segment",  # binary/corrupt heavy
    "0 0 0 0 0 0 0 0 0 0 word",          # zero-word patterns
]


def _prose(rng: np.random.RandomState, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS, size=n_words))


def _spanful(rng: np.random.RandomState) -> str:
    lines = []
    for _ in range(rng.randint(3, 9)):
        conf = round(float(rng.uniform(0.0, 1.0)), 2)
        lines.append(f"{conf}|{_prose(rng, rng.randint(2, 8))}")
    return "\n".join(lines)


def _htmlish(rng: np.random.RandomState) -> str:
    main1 = _prose(rng, rng.randint(8, 25))
    main2 = _prose(rng, rng.randint(8, 25))
    link_farm = " ".join(
        f'<a href="/p{i}">{_prose(rng, 2)}</a>' for i in range(6)
    )
    return (
        "<html><head><title>t</title><style>p{color:red}</style></head><body>"
        f"<nav><a href='/'>home</a> <a href='/x'>browse</a> menu menu</nav>"
        f"<div><p>{main1}</p><p>{main2}</p></div>"
        f"<div>{link_farm}</div>"
        f"<footer>copyright {_prose(rng, 3)} all rights reserved</footer>"
        "</body></html>"
    )


def _pdfish(rng: np.random.RandomState) -> str:
    lines = []
    for page in range(1, rng.randint(2, 4)):
        for col in (1, 2):
            for y in range(1, rng.randint(2, 5)):
                lines.append(f"{page}|{col}|{y * 10}|{_prose(rng, rng.randint(4, 10))}")
        lines.append(f"{page}|1|999|Page {page}")  # furniture
    rng.shuffle(lines)  # arbitrary physical order; extractor restores reading order
    return "\n".join(lines)


def make_transcripts_pdf(
    n_convs: int = 60,
    seed: int = SEED,
    hot_conv_turns: int = 0,
) -> pd.DataFrame:
    """Rich deterministic corpus covering every content class.

    ``hot_conv_turns`` > 0 adds one deliberately hot conv_id ("conv_hot")
    to exercise skew salting.
    """
    rng = np.random.RandomState(seed)
    rows = []
    base_ts = datetime(2024, 1, 1)
    for c in range(n_convs):
        conv_id = f"conv_{c:05d}"
        n_turns = int(rng.randint(3, 20))
        for t in range(n_turns):
            kind = rng.randint(0, 10)
            if kind <= 4:
                text, tool = _prose(rng, int(rng.randint(5, 60))), None
            elif kind <= 5:
                text, tool = _spanful(rng), "spans"
            elif kind <= 6:
                text, tool = _htmlish(rng), "html"
            elif kind <= 7:
                text, tool = _pdfish(rng), "pdf"
            else:
                text, tool = _NOISE_PAYLOADS[int(rng.randint(len(_NOISE_PAYLOADS)))], None
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.int32(t),
                    "role": _ROLES[int(rng.randint(4))],
                    "text": text,
                    "tool": tool,
                    "ts": base_ts + timedelta(hours=c, seconds=t * 30),
                }
            )
    for t in range(hot_conv_turns):
        rows.append(
            {
                "conv_id": "conv_hot",
                "turn_idx": np.int32(t),
                "role": _ROLES[t % 4],
                "text": f"hot conversation turn number {t} with steady prose content",
                "tool": None,
                "ts": base_ts + timedelta(days=30, seconds=t),
            }
        )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def synth_transcripts_spark(spark, n_turns: int, n_convs: int | None = None,
                            diversify: bool = False, id_offset: int = 0):
    """Distributed deterministic corpus: pure column expressions over
    ``spark.range`` — generation parallelizes with the input partitioning
    and never funnels through the driver.

    ``diversify=False`` (default, the extraction-bench corpus) rotates the
    vocabulary from a hashed start — only ~|vocab| distinct prose bodies
    exist, which is fine for the extraction kernel but collapses under
    dedup. ``diversify=True`` picks every word position independently by
    hash (plus a unique id token), so texts are essentially unique with low
    pairwise jaccard — the corpus the curation-job bench needs.
    """
    from pyspark.sql import functions as F

    if n_convs is None:
        n_convs = max(1, n_turns // 40)
    # id_offset shifts the generator id range: ids unseen by a previous
    # corpus produce fresh texts, overlapping ids reproduce that corpus's
    # rows exactly — which is how the bench synthesizes an incremental
    # batch that is part redelivery, part novel
    df = spark.range(id_offset, id_offset + n_turns)
    conv = F.pmod(F.xxhash64(F.col("id")), F.lit(n_convs))
    mode = F.pmod(F.col("id"), F.lit(10))
    w = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(len(_WORDS)))
    base_words = F.array(*[F.lit(x) for x in _WORDS])
    if diversify:
        # per-position hashed word choice + per-doc unique token
        prose = F.concat(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda i: F.element_at(
                        base_words,
                        (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(_WORDS)))
                         + 1).cast("int"),
                    ),
                ),
            ),
            F.lit(" uid"), F.conv(F.xxhash64("id").cast("string"), 10, 16),
        )
    else:
        # ~40-word deterministic prose: rotate through the vocab from a
        # hashed start
        prose = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.element_at(base_words, (F.pmod(w + i * 7, F.lit(len(_WORDS))) + 1).cast("int")),
            ),
        )
    spanful = F.concat(
        F.lit("0.9|"), prose, F.lit("\n0.1|dropped low confidence\n0.55|"),
        F.substring(prose, 1, 80),
    )
    htmlish = F.concat(
        F.lit("<html><head><style>x{}</style></head><body><nav>"
              "<a href='/'>home</a> nav nav</nav><p>"),
        prose,
        F.lit("</p><div><a href='/1'>l1</a> <a href='/2'>l2</a></div><footer>"
              "copyright footer text here</footer></body></html>"),
    )
    pdfish = F.concat(
        F.lit("2|1|10|"), F.substring(prose, 1, 60),
        F.lit("\n1|1|999|Page 1\n1|2|10|"), F.substring(prose, 20, 60),
        F.lit("\n1|1|10|"), F.substring(prose, 40, 60),
    )
    noise = F.element_at(
        F.array(*[F.lit(x) for x in _NOISE_PAYLOADS]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(len(_NOISE_PAYLOADS))) + 1).cast("int"),
    )
    text = (
        F.when(mode <= 5, prose)
        .when(mode == 6, spanful)
        .when(mode == 7, htmlish)
        .when(mode == 8, pdfish)
        .otherwise(noise)
    )
    tool = (
        F.when(mode == 6, F.lit("spans"))
        .when(mode == 7, F.lit("html"))
        .when(mode == 8, F.lit("pdf"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.concat(F.lit("conv_"), F.lpad(conv.cast("string"), 7, "0")).alias("conv_id"),
        # turn_idx = id: globally unique, hence unique WITHIN the hashed
        # conversation too (conv from xxhash64(id)%n_convs with turn_idx =
        # id//n_convs produced duplicate (conv_id, turn_idx) keys). Values
        # are sparse per conversation — the contract needs a stable int32
        # ordering key, not contiguity.
        F.col("id").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
    )
