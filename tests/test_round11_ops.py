"""Round-11 operator pins: cross-document repeated-span removal
(dedup.remove_repeated_spans) — the substring granularity doc- and
paragraph-level dedup both miss."""

import pytest
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.operators.dedup import (
    SPAN_FOOTER, SPAN_HEADER, remove_repeated_spans, synth_span_expr)

SF_DIR = "/root/testdata/sf0.001"

HDR = "Subscribe To Our Newsletter For Daily Updates"  # 7 words


def _planted(spark, n_docs=8, footer=False):
    rows = []
    for i in range(n_docs):
        body = (f"unusual-{i} narrative about topic-{i * 7} mentioning "
                f"item-{i * 11} and fact-{i * 13} end-{i * 17}")
        txt = HDR + " " + body
        if footer:
            txt = txt + "  " + SPAN_FOOTER
        rows.append((i, txt, body))
    return spark.createDataFrame(rows,
                                 "doc_id bigint, text string, body string")


def test_spans_removed_and_kept_text_byte_identical(spark):
    """The planted header is removed on every doc and the remaining
    text is BYTE-IDENTICAL to the original body (the contiguous kept
    region keeps its original separators)."""
    df = _planted(spark)
    out = {r["id"]: r for r in
           remove_repeated_spans(df, min_ngram=5, min_df=4).collect()}
    bodies = {r["doc_id"]: r["body"] for r in df.collect()}
    for i, body in bodies.items():
        assert out[i]["text_clean"] == body, i
        assert out[i]["n_tokens_removed"] == 7
        assert out[i]["n_spans_removed"] == 1


def test_header_and_footer_two_spans(spark):
    df = _planted(spark, footer=True)
    out = {r["id"]: r for r in
           remove_repeated_spans(df, min_ngram=5, min_df=4).collect()}
    bodies = {r["doc_id"]: r["body"] for r in df.collect()}
    for i, body in bodies.items():
        assert out[i]["text_clean"] == body, (i, out[i]["text_clean"])
        assert out[i]["n_spans_removed"] == 2
        assert out[i]["n_tokens_removed"] == 7 + len(SPAN_FOOTER.split())


def test_untouched_docs_byte_identical(spark):
    """Docs carrying no repeated n-gram pass through with their exact
    bytes — including leading/trailing whitespace and interior runs."""
    weird = "  Oddly\t spaced   unique document nobody else repeats  "
    df = _planted(spark).unionByName(
        _planted(spark).sparkSession.createDataFrame(
            [(99, weird, weird)],
            "doc_id bigint, text string, body string"))
    out = {r["id"]: r for r in
           remove_repeated_spans(df, min_ngram=5, min_df=4).collect()}
    assert out[99]["text_clean"] == weird
    assert out[99]["n_tokens_removed"] == 0
    assert out[99]["n_spans_removed"] == 0


def test_interior_span_splices_with_one_space(spark):
    mid = "CLICK HERE TO ACCEPT ALL COOKIES NOW"
    # neighbors unique per doc: a shared word ADJACENT to the shared
    # span would legitimately extend the repeated n-grams into it
    rows = [(i, f"u{i}x u{i}y u{i}z {mid} v{i}x v{i}y v{i}z")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["id"]: r["text_clean"] for r in
           remove_repeated_spans(df, min_ngram=5, min_df=4).collect()}
    for i in range(6):
        assert out[i] == f"u{i}x u{i}y u{i}z v{i}x v{i}y v{i}z"


def test_case_insensitive_match_case_preserving_output(spark):
    """Matching lowercases the n-gram identity, but surviving text is
    never case-mangled."""
    rows = [(i, ("COMMON BOILERPLATE PHRASE REPEATED VERBATIM "
                 if i % 2 else "common boilerplate phrase repeated "
                               "verbatim ")
             + f"UqA{i} MixEd{i} TaIl{i} pad-{i * 3} end-{i * 5}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["id"]: r["text_clean"] for r in
           remove_repeated_spans(df, min_ngram=5, min_df=4).collect()}
    for i in range(6):
        # the differently-CASED boilerplate matched anyway; the kept
        # mixed-case tail is byte-identical, never case-mangled
        assert out[i] == (f"UqA{i} MixEd{i} TaIl{i} "
                          f"pad-{i * 3} end-{i * 5}")


def test_within_doc_repetition_not_removed(spark):
    """A doc repeating a phrase 10x alone (df = 1) is untouched —
    within-doc repetition is repetition_stats' dimension, not
    cross-document boilerplate."""
    loop = " ".join(["again and again we go round"] * 10)
    df = spark.createDataFrame(
        [(0, loop)] + [(i, f"unique filler doc {i} nothing shared "
                           f"w-{i * 7} x-{i * 11} y-{i * 13} z-{i * 17}")
                       for i in range(1, 5)],
        "doc_id bigint, text string")
    out = {r["id"]: r for r in
           remove_repeated_spans(df, min_ngram=5, min_df=2).collect()}
    assert out[0]["text_clean"] == loop
    assert out[0]["n_tokens_removed"] == 0


def test_short_docs_and_validation(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "a b c")],
                               "doc_id bigint, text string")
    out = {r["id"]: r for r in
           remove_repeated_spans(df, min_ngram=5, min_df=2).collect()}
    # < n words: no n-grams, untouched (whole-doc dup is exact dedup's job)
    assert out[0]["text_clean"] == "a b c"
    with pytest.raises(ValueError):
        remove_repeated_spans(df, min_ngram=1)
    with pytest.raises(ValueError):
        remove_repeated_spans(df, min_df=1)


def test_duplicated_ngram_fraction_drops_on_cleaned_corpus(spark):
    """The VERDICT 'done' pin: the cross-doc duplicated-ngram measure
    drops measurably after span removal on the planted documents
    fixture."""
    from flink_descriptive_stats_spark.operators.dedup import \
        duplicated_ngram_fraction
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, SF_DIR, "documents")
            .where(F.col("text").isNotNull()))
    planted = docs.select(
        "doc_id", synth_span_expr("text", "doc_id").alias("text"))
    cleaned = (remove_repeated_spans(planted, min_ngram=5, min_df=25)
               .select(F.col("id").alias("doc_id"),
                       F.col("text_clean").alias("text")))

    def mean_dup(frame):
        return (duplicated_ngram_fraction(frame)
                .agg(F.avg("dup_fraction")).collect()[0][0])

    before, after = mean_dup(planted), mean_dup(cleaned)
    # the synthetic corpus carries heavy natural 3-gram duplication
    # (~0.68 baseline) — the planted boilerplate's removal still moves
    # the corpus mean measurably, and the spans themselves are GONE
    assert after < before - 0.02, (before, after)
    assert cleaned.where(F.col("text").contains(SPAN_HEADER)).count() == 0
    assert cleaned.where(F.col("text").contains(SPAN_FOOTER)).count() == 0


def test_planted_fixture_nonvacuous_every_branch(spark):
    """The gated query's fixture must exercise header-only,
    footer-only, both, and neither docs at the smallest SF."""
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, SF_DIR, "documents")
            .where(F.col("text").isNotNull()))
    planted = docs.select(
        "doc_id", synth_span_expr("text", "doc_id").alias("text"))
    got = planted.select(
        F.count_if(F.col("text").startswith(SPAN_HEADER)
                   & F.col("text").endswith(SPAN_FOOTER)).alias("both"),
        F.count_if(F.col("text").startswith(SPAN_HEADER)
                   & ~F.col("text").endswith(SPAN_FOOTER)).alias("h"),
        F.count_if(~F.col("text").startswith(SPAN_HEADER)
                   & F.col("text").endswith(SPAN_FOOTER)).alias("f"),
        F.count_if(~F.col("text").startswith(SPAN_HEADER)
                   & ~F.col("text").endswith(SPAN_FOOTER)).alias("n"),
    ).collect()[0]
    assert min(got["both"], got["h"], got["f"], got["n"]) > 0, got


def test_grouped_hamming_funnel_equals_per_group_runs(spark):
    """r11 (VERDICT ask #7): the (group, band)-keyed funnel returns
    row-for-row the union of per-group funnels — cross-group pairs
    impossible, bucket caps per group — while paying one job."""
    from flink_descriptive_stats_spark.operators.multimodal import \
        hamming_neardup_pairs
    import random
    rng = random.Random(7)
    rows = []
    for i in range(120):
        base = rng.getrandbits(64) - (1 << 63)
        src = f"s{i % 3}"
        rows.append((i * 2, base, src))
        # a near-dup sibling IN THE SAME group (flip one low bit)
        rows.append((i * 2 + 1, base ^ (1 << (i % 8)), src))
    df = spark.createDataFrame(rows, "id bigint, phash bigint, "
                                     "__src string")
    merged = {(r["id_a"], r["id_b"], r["hamming"]) for r in
              hamming_neardup_pairs(df, max_hamming=6,
                                    group_col="__src").collect()}
    per_group = set()
    for s in ("s0", "s1", "s2"):
        per_group |= {(r["id_a"], r["id_b"], r["hamming"]) for r in
                      hamming_neardup_pairs(
                          df.where(F.col("__src") == s)
                          .select("id", "phash"),
                          max_hamming=6).collect()}
    assert merged == per_group and merged
    # sanity: no pair crosses groups
    src_of = {r["id"]: r["__src"] for r in df.collect()}
    assert all(src_of[a] == src_of[b] for a, b, _ in merged)


def test_boilerplate_ngrams_report(spark):
    """The triage view shows the actual boilerplate strings ranked by
    document frequency with deterministic ties; within-doc repetition
    counts once per doc."""
    from flink_descriptive_stats_spark.operators.dedup import \
        boilerplate_ngrams
    rows = [(i, HDR + f" unique tail {i} x-{i * 3} y-{i * 7} z-{i * 11}")
            for i in range(6)]
    rows.append((99, (HDR + " ") * 3 + "self repeater"))  # 1 doc, 3x
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = boilerplate_ngrams(df, min_ngram=5, min_df=4, k=10).collect()
    grams = {r["ngram"]: r["df_docs"] for r in out}
    assert "subscribe to our newsletter for" in grams
    assert grams["subscribe to our newsletter for"] == 7  # 99 once
    # ordering: df desc then ngram asc
    seq = [(r["df_docs"], r["ngram"]) for r in out]
    assert seq == sorted(seq, key=lambda t: (-t[0], t[1]))
    with pytest.raises(ValueError):
        boilerplate_ngrams(df, min_df=1)


def test_curate_corpus_despan_stage_nonvacuous(spark):
    """curate_corpus(despan_min_df=...) rewrites text through span
    removal between decontamination and the quality filter: the
    planted boilerplate is GONE from every selected doc, and the
    selection itself differs from the plain pipeline (the stage feeds
    the quality filter different text)."""
    from flink_descriptive_stats_spark.operators.dedup import (
        SPAN_FOOTER, SPAN_HEADER, synth_span_expr)
    from flink_descriptive_stats_spark.operators.quality import \
        curate_corpus
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, SF_DIR, "documents")
            .withColumn("text", synth_span_expr("text", "doc_id")))
    train = docs.where(F.col("doc_id") % 10 != 0)
    hold = docs.where(F.col("doc_id") % 10 == 0)
    plain = curate_corpus(train, hold)
    sp = curate_corpus(train, hold, despan_min_df=25)
    assert sp.columns == plain.columns
    assert sp.where(F.col("text").contains(SPAN_HEADER)).count() == 0
    assert sp.where(F.col("text").contains(SPAN_FOOTER)).count() == 0
    # the plain pipeline keeps the boilerplate — the stage is live
    assert plain.where(F.col("text").contains(SPAN_HEADER)).count() > 0
    plain_txt = {r["doc_id"]: r["text"] for r in plain.collect()}
    sp_txt = {r["doc_id"]: r["text"] for r in sp.collect()}
    assert sp_txt != plain_txt


def test_span_removal_stats_consistent_with_rewrite(spark):
    """The aggregate planning view equals aggregates of the rewrite's
    own per-doc output."""
    from flink_descriptive_stats_spark.operators.dedup import (
        remove_repeated_spans, span_removal_stats)
    df = _planted(spark, footer=True)
    [st] = span_removal_stats(df, min_ngram=5, min_df=4).collect()
    per = remove_repeated_spans(df, min_ngram=5, min_df=4).collect()
    assert st["n_docs"] == len(per)
    assert st["n_docs_affected"] == sum(
        1 for r in per if r["n_tokens_removed"] > 0)
    assert st["n_tokens_removed"] == sum(
        r["n_tokens_removed"] for r in per)
    assert st["n_spans_removed"] == sum(
        r["n_spans_removed"] for r in per)


def test_remove_listed_spans_matches_mined_on_controlled_fixture(spark):
    """With the frozen list equal to the only cross-doc boilerplate,
    the map-only applier and the mining remover produce IDENTICAL
    output (one shared rewrite bundle); the list path needs no second
    corpus and no shuffle."""
    from flink_descriptive_stats_spark.operators.dedup import (
        remove_listed_spans, remove_repeated_spans)
    df = _planted(spark, footer=True)
    mined = {r["id"]: tuple(r) for r in
             remove_repeated_spans(df, min_ngram=5,
                                   min_df=4).collect()}
    listed = {r["id"]: tuple(r) for r in
              remove_listed_spans(df, [HDR, SPAN_FOOTER]).collect()}
    assert mined == listed
    with pytest.raises(ValueError):
        remove_listed_spans(df, [])
    with pytest.raises(ValueError):
        remove_listed_spans(df, ["  "])


def test_remove_listed_spans_plan_is_narrow(spark):
    """The frozen-list applier is ONE codegen Project over the scan —
    no Exchange, no Arrow, no join: the property that makes it the
    apply-everywhere half of the mine-then-apply recipe."""
    df = _planted(spark)
    from flink_descriptive_stats_spark.operators.dedup import \
        remove_listed_spans
    out = remove_listed_spans(df, [HDR])
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "ArrowEval" not in plan and "BatchEval" not in plan


def test_remove_listed_spans_streams_stateless(spark, tmp_path):
    """Stateless per row: the same call runs under Structured
    Streaming and emits row-for-row the batch output."""
    from flink_descriptive_stats_spark.operators.dedup import \
        remove_listed_spans
    df = _planted(spark, footer=True).drop("body")
    chunks = str(tmp_path / "chunks")
    df.repartition(2).write.parquet(chunks)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(chunks))
    sink = str(tmp_path / "sink")
    q = (remove_listed_spans(stream, [HDR, SPAN_FOOTER])
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["id"]: tuple(r) for r in spark.read.parquet(sink).collect()}
    want = {r["id"]: tuple(r) for r in
            remove_listed_spans(df, [HDR, SPAN_FOOTER]).collect()}
    assert got == want


def test_referential_integrity_composite(spark, ):
    """Composite fk/pk tuples: any-NULL-component counts as null_fk,
    orphans are pair misses, distinct_orphan_keys counts component
    combinations; width mismatch raises."""
    from flink_descriptive_stats_spark.operators.extras import \
        referential_integrity
    dim = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "a bigint, b bigint")
    fact = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 9), (2, 9), (None, 1), (3, None)],
        "x bigint, y bigint")
    [r] = referential_integrity(fact, dim, ("x", "y"),
                                ("a", "b")).collect()
    assert (r["fk_rows"], r["null_fk"], r["matched"],
            r["orphans"], r["distinct_orphan_keys"]) == (4, 2, 2, 2, 1)
    with pytest.raises(ValueError):
        referential_integrity(fact, dim, ("x", "y"), "a")
    # single-column path unchanged
    [s1] = referential_integrity(fact, dim, "x", "a").collect()
    assert s1["null_fk"] == 1 and s1["orphans"] == 1  # x=3 orphan


def test_card_url_section_suffix_aware(spark, tmp_path):
    """url_suffixes threads through the card, the by-source triage,
    and the streaming monitor: with suffixes=["co.uk"] the domain
    tally keys on bbc.co.uk-style registrable domains everywhere
    (batch == by-source slice == streaming, the r10 contracts), and a
    monitor restart with a DIFFERENT list refuses to merge."""
    from flink_descriptive_stats_spark.operators.quality import (
        dataset_card, dataset_card_by_source)
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    rows = [(i, f"document body number {i} with words w-{i * 3}",
             "sA" if i % 2 else "sB",
             f"https://site{i % 3}.co.uk/p{i}") for i in range(12)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, url string")
    sfx = ["co.uk"]

    def _url_rows(frame, **kw):
        return {r["metric"]: r["value"]
                for r in dataset_card(frame, url_col="url", **kw)
                .collect() if r["section"] == "url"}

    plain, aware = _url_rows(df), _url_rows(df, url_suffixes=sfx)
    assert plain["n_domains"] == "1"     # everything collapses to co.uk
    assert aware["n_domains"] == "3"     # site0/1/2.co.uk
    assert aware["max_domain_share"] != plain["max_domain_share"]
    bys = {(r["source"], r["metric"]): r["value"]
           for r in dataset_card_by_source(
               df, url_col="url", url_suffixes=sfx).collect()}
    # slice equality against the corpus card on the slice
    slice_a = _url_rows(df.where(F.col("source") == "sA"),
                        url_suffixes=sfx)
    assert bys[("sA", "url_n_domains")] == slice_a["n_domains"]

    chunks = str(tmp_path / "chunks")
    df.repartition(2).write.parquet(chunks)
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")

    def _mon(suffixes, ckpt):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(chunks))
        q = start_card_monitor(stream, sink, state_path=state,
                               checkpoint_path=str(tmp_path / ckpt),
                               url_col="url", url_suffixes=suffixes)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {r["metric"]: r["value"]
                for r in spark.read.parquet(sink).collect()
                if r["section"] == "url"}

    got = _mon(sfx, "ckpt")
    want = _url_rows(df, url_suffixes=sfx)
    assert got == want                   # streaming == batch
    with pytest.raises(ValueError, match="url_suffixes"):
        _mon(["com.au"], "ckpt2")


def test_decontaminate_spans_surgical(spark):
    """Only the holdout-quoted span is removed; the rest of each train
    doc is byte-identical; a train doc ENTIRELY made of holdout text
    empties; clean docs and <n-word docs pass through untouched."""
    from flink_descriptive_stats_spark.operators.dedup import \
        decontaminate_spans
    hold = spark.createDataFrame(
        [(100, "What is the capital city of France exactly")],
        "doc_id bigint, text string")
    train = spark.createDataFrame(
        [(1, "intro-1 words here What is the capital city of France "
             "exactly tail-1 closing"),
         (2, "What is the capital city of France exactly"),
         (3, "totally unrelated document nine unique words w3 w5 w7"),
         (4, "tiny doc")],
        "doc_id bigint, text string")
    out = {r["id"]: r for r in
           decontaminate_spans(train, hold, min_ngram=5).collect()}
    assert out[1]["text_clean"] == "intro-1 words here tail-1 closing"
    assert out[1]["n_spans_removed"] == 1
    assert out[2]["text_clean"] == "" and out[2]["n_tokens_removed"] == 8
    assert out[3]["text_clean"] == train.collect()[2]["text"]
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_clean"] == "tiny doc"
    with pytest.raises(ValueError):
        decontaminate_spans(train, hold, min_ngram=1)


def test_decontaminate_spans_drops_contamination_measure(spark):
    """After the surgical pass, contamination_report's matched
    fraction over the planted corpus drops to (near) zero for the
    quote n-width."""
    from flink_descriptive_stats_spark.operators.dedup import (
        contamination_report, decontaminate_spans, synth_quote_expr)
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, SF_DIR, "documents")
            .where(F.col("text").isNotNull()))
    planted = docs.select(
        "doc_id", synth_quote_expr("text", "doc_id").alias("text"))
    train = planted.where(F.col("doc_id") % 10 != 0)
    hold = planted.where(F.col("doc_id") % 10 == 0)

    def mean_match(frame):
        rep = contamination_report(hold, frame, n=5)
        # report is per-HOLDOUT-doc vs a train corpus
        return rep.agg(F.avg("matched_fraction")).collect()[0][0]

    cleaned = (decontaminate_spans(train, hold, min_ngram=5)
               .select(F.col("id").alias("doc_id"),
                       F.col("text_clean").alias("text")))
    before, after = mean_match(train), mean_match(cleaned)
    # the 9-word quote is a few percent of each holdout doc's
    # shingles (different tokenization than the span words, so the
    # report is an independent measure) — the surgical pass must
    # remove a visible share of it
    assert before > 0.02       # the plant is live
    assert after < before * 0.9, (before, after)


def test_boilerplate_by_source_counts(spark):
    """Per-source doc frequencies of the corpus top-k grams; NULL
    sources excluded; candidate set equals boilerplate_ngrams'."""
    from flink_descriptive_stats_spark.operators.dedup import (
        boilerplate_by_source, boilerplate_ngrams)
    rows = ([(i, HDR + f" unique-{i} words w-{i * 3} x-{i * 7} "
                       f"y-{i * 11} z-{i * 13}",
              "sA" if i % 2 else "sB") for i in range(8)]
            + [(50, HDR + " null src doc words a1 b2 c3 d4", None)])
    df = spark.createDataFrame(rows,
                               "doc_id bigint, text string, "
                               "source string")
    out = boilerplate_by_source(df, min_ngram=5, min_df=4).collect()
    grams = {r["ngram"] for r in out}
    top = {r["ngram"] for r in
           boilerplate_ngrams(df, min_ngram=5, min_df=4).collect()}
    assert grams <= top and grams
    per = {(r["ngram"], r["source"]): r["df_docs"] for r in out}
    g = "subscribe to our newsletter for"
    assert per[(g, "sA")] == 4 and per[(g, "sB")] == 4  # null excluded
    assert not [s for _, s in per if s is None]


def test_card_boilerplate_section_and_monitor(spark, tmp_path):
    """The card's boilerplate section (both routes identical) and the
    streaming twin: per-phrase doc counts and the any-phrase fraction
    are sum-monoids — streaming == batch incl. restart; a restart
    with a different phrase list refuses to merge."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    phrases = [HDR, "never present phrase here anywhere"]
    rows = [(i, (HDR + " " if i % 2 else "") +
             f"body words {i} unique w-{i * 3} x-{i * 7}", f"s{i % 2}")
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                     "source string")

    def _sec(frame, **kw):
        return [(r["metric"], r["value"])
                for r in dataset_card(frame,
                                      boilerplate_phrases=phrases,
                                      **kw).collect()
                if r["section"] == "boilerplate"]

    one, five = _sec(df), _sec(df, single_pass=False)
    assert one == five
    d = dict(one)
    assert d[f"docs_with[{HDR}]"] == "5"
    assert d["docs_with[never present phrase here anywhere]"] == "0"
    assert d["affected_doc_fraction"] == "5000000e-7"

    chunks = str(tmp_path / "chunks")
    df.repartition(2).write.parquet(chunks)
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")

    def _mon(ph, ckpt):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(chunks))
        q = start_card_monitor(stream, sink, state_path=state,
                               checkpoint_path=str(tmp_path / ckpt),
                               boilerplate_phrases=ph)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [(r["metric"], r["value"])
                for r in spark.read.parquet(sink).collect()
                if r["section"] == "boilerplate"]

    assert sorted(_mon(phrases, "ck1")) == sorted(one)
    more = spark.createDataFrame([(100, HDR + " late doc", "s0")],
                                 df.schema)
    more.coalesce(1).write.mode("append").parquet(chunks)
    got = dict(_mon(phrases, "ck1"))
    want = dict(_sec(df.unionByName(more)))
    assert got == want                      # restart + late batch
    with pytest.raises(ValueError, match="boilerplate_phrases"):
        _mon([HDR], "ck2")


def test_ngram_df_histogram_boilerplate_spike(spark):
    """The instrument's purpose: planted boilerplate lands in its own
    high-DF buckets above the organic-sharing decay; DF-1 grams are
    excluded; buckets partition [2, inf)."""
    from flink_descriptive_stats_spark.operators.dedup import (
        ngram_df_histogram, synth_span_expr)
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, SF_DIR, "documents")
            .where(F.col("text").isNotNull()))
    planted = docs.select(
        "doc_id", synth_span_expr("text", "doc_id").alias("text"))
    rows = sorted((r["bucket_min_df"], r["bucket_max_df"],
                   r["n_ngrams"], r["n_doc_ngrams"])
                  for r in ngram_df_histogram(planted).collect())
    assert rows[0][0] == 2
    for lo, hi, n_g, n_d in rows:
        assert hi == 2 * lo - 1 and n_g > 0 and n_d >= 2 * n_g - n_g
    # the header (df ~333) and footer (df ~125) spike above every
    # organic bucket: the top TWO buckets hold exactly the 3+4
    # planted gram groups
    assert rows[-1][2] == 3 and rows[-2][2] == 4
    with pytest.raises(ValueError):
        ngram_df_histogram(planted, min_ngram=1)


def test_fk_discover_composite_approx_mode(spark):
    """approx=True with max_key_width=2: the pair-distinct statistic
    rides HLL++ over the xxhash64-combined key; the true composite
    edge still survives the slackened prunes on the fixture."""
    from flink_descriptive_stats_spark.operators import dependencies as DP
    parent = spark.createDataFrame(
        [(g, i, g * 10 + i) for g in range(1, 5)
         for i in range(1, g + 1)],
        "p_grp bigint, p_idx bigint, p_val bigint")
    child = spark.createDataFrame(
        [(1, 1, 7), (2, 1, 7), (2, 2, 7), (4, 3, 7), (2, 3, 7),
         (None, 2, 9)],
        "f_grp bigint, f_idx bigint, f_x bigint")
    out = DP.fk_discover({"parent": parent, "fact": child},
                         min_containment=0.5, max_key_width=2,
                         approx=True).collect()
    comp = [r for r in out if "," in r["child_col"]]
    assert [(r["child_table"], r["parent_table"]) for r in comp] \
        == [("fact", "parent")]
    # the emitted containment stays EXACT in approx mode
    assert comp[0]["n_orphans"] == 1
