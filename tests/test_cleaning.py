"""Text cleaning / unicode normalization (operators/cleaning.py):
code-point-class repairs, damage report counts, NFC composition, and
the Spark<->DuckDB parity sweep. All non-ASCII test data is written as
\\uXXXX escapes so every code point is reviewable."""

import duckdb
import pytest
from pyspark.sql import functions as F


def _clean_one(spark, s: str) -> str | None:
    from flink_descriptive_stats_spark.operators import cleaning as C
    return (spark.createDataFrame([(1, s)], "doc_id bigint, text string")
            .select(C.clean_text_expr(F.col("text")).alias("t"))
            .collect()[0]["t"])


def test_control_chars_removed_whitespace_kept(spark):
    assert _clean_one(spark, "a\x07b\x1bc\x0bd") == "abcd"
    # tab / newline / CR are CONTENT whitespace, not damage
    assert _clean_one(spark, "a\tb\nc\rd") == "a\tb\nc\rd"
    # DEL and a C1 control
    assert _clean_one(spark, "a\x7fb\x85c") == "abc"


def test_zero_width_removed(spark):
    assert _clean_one(
        spark,
        "\ufeffzero\u200bwidth\u200c\u200d soft\u00adhyphen\u2060"
    ) == "zerowidth softhyphen"


def test_unicode_spaces_mapped_not_collapsed(spark):
    # each exotic space becomes ONE ascii space; runs stay runs
    assert _clean_one(spark, "a\u00a0\u2009b\u3000c") == "a  b c"
    assert _clean_one(spark, "a b\u2003 c") == "a b  c"


def test_combining_marks_survive_cleaning(spark):
    # NFC is a separate opt-in op; cleaning never touches marks
    s = "cafe\u0301"
    assert _clean_one(spark, s) == s


def test_clean_text_null_excluded(spark):
    from flink_descriptive_stats_spark.operators import cleaning as C
    df = spark.createDataFrame([(1, "a"), (2, None)],
                               "doc_id bigint, text string")
    assert C.clean_text(df).count() == 1


def test_cleaning_report_counts_and_invariant(spark):
    from flink_descriptive_stats_spark.operators import cleaning as C
    df = spark.createDataFrame(
        [(1, "x\x07y\u200b\u00a0z"), (2, "clean")],
        "doc_id bigint, text string")
    rows = {r["id"]: r for r in C.cleaning_report(df).collect()}
    r = rows[1]
    assert (r["n_control"], r["n_zero_width"], r["n_unicode_space"]) \
        == (1, 1, 1)
    # removals shrink, space maps keep length
    assert r["n_chars_clean"] == r["n_chars"] - r["n_control"] \
        - r["n_zero_width"]
    assert r["changed"] is True
    assert rows[2]["changed"] is False


def test_nfc_composes_and_is_idempotent(spark):
    from flink_descriptive_stats_spark.operators import cleaning as C
    df = spark.createDataFrame(
        [(1, "cafe\u0301"), (2, "caf\u00e9"), (3, None)],
        "doc_id bigint, text string")
    out = {r["id"]: r["text_nfc"] for r in C.nfc_normalize(df).collect()}
    assert out[1] == "caf\u00e9" and len(out[1]) == 4
    assert out[2] == "caf\u00e9"  # already composed: unchanged
    assert 3 not in out  # NULL text out of scope


ADVERSARIAL = [
    "",
    "plain ascii only",
    "\x00nul\x01 soh",
    "mix\u200b\x07 of al\u0301l three",
    "\u3000\u3000double ideographic",
    "tab\tand\u2060joiner",
    "\ufeff\ufeffdouble bom",
    "edge c1 \u009f high",
    "\u1680ogham mark",
    "narrow\u202fnbsp math\u205fspace hair\u200aspace",
]


def test_clean_parity_spark_duckdb(spark):
    """Character-for-character: Spark's clean expression == the DuckDB
    oracle's replace chain on adversarial inputs."""
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.oracle_pipeline import _duck_str
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["t"] for r in sdf.select(
        "doc_id", C.clean_text_expr(F.col("text")).alias("t")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(ADVERSARIAL):
        if "\x00" in s:
            # DuckDB varchars cannot hold NUL; pin the Spark-side
            # behavior directly (both controls removed)
            assert got[i] == "nul soh"
            continue
        x = f"regexp_replace({_duck_str(s)}, '{C.CONTROL_RE}', '', 'g')"
        x = f"regexp_replace({x}, '{C.ZERO_WIDTH_RE}', '', 'g')"
        x = f"regexp_replace({x}, '{C.UNICODE_SPACE_RE}', ' ', 'g')"
        duck = con.execute(f"SELECT {x}").fetchone()[0]
        assert got[i] == duck, (i, s)


def test_nfc_parity_spark_duckdb(spark):
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.oracle_pipeline import _duck_str
    cases = ["cafe\u0301", "A\u030a", "\u00c5", "q\u0323\u0307",
             "plain", "combining\u0308 run\u0301\u0301"]
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)],
        "doc_id bigint, text string")
    got = {r["id"]: r["text_nfc"]
           for r in C.nfc_normalize(sdf).collect()}
    con = duckdb.connect()
    for i, s in enumerate(cases):
        duck = con.execute(
            f"SELECT nfc_normalize({_duck_str(s)})").fetchone()[0]
        assert got[i] == duck, (i, s)


def test_dirty_fixture_covers_every_class(spark):
    """Each damage class must be non-empty on the fixture or the gated
    queries go vacuous; the pristine variant must stay byte-identical."""
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .where(F.col("text").isNotNull()))
    dirty = docs.select(
        "doc_id", "text",
        C.synth_dirty_expr(F.col("text"), F.col("doc_id")).alias("dirty"))
    rep = C.cleaning_report(dirty, text_col="dirty")
    agg = rep.agg(F.sum("n_control").alias("c"),
                  F.sum("n_zero_width").alias("z"),
                  F.sum("n_unicode_space").alias("s")).collect()[0]
    assert agg["c"] > 0 and agg["z"] > 0 and agg["s"] > 0
    pristine = dirty.where(F.col("doc_id") % 5 == 4) \
        .where(F.col("dirty") != F.col("text")).count()
    assert pristine == 0


def test_clean_text_plan_is_pure_codegen(spark):
    """No Exchange, no Python/Arrow eval: a map-only Project."""
    from flink_descriptive_stats_spark.operators import cleaning as C
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    plan = C.clean_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "Arrow" not in plan


def test_cli_clean_subcommand(spark, capsys, tmp_path):
    from flink_descriptive_stats_spark.__main__ import main
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame([(1, "a b\u200b")],
                          "doc_id bigint, text string").write.parquet(src)
    rc = main(["clean", src])
    assert rc == 0 and "text_clean" in capsys.readouterr().out
    rc = main(["clean", src, "--report"])
    assert rc == 0 and "n_zero_width" in capsys.readouterr().out
    rc = main(["clean", src, "--nfc"])
    assert rc == 0 and "text_nfc" in capsys.readouterr().out
    rc = main(["clean", src, "--report", "--nfc"])
    assert rc == 2
    assert "exclusive" in capsys.readouterr().err


# ---------------------------------------------- card / monitor sections

def _dirty_docs(spark):
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .where(F.col("text").isNotNull()).limit(60))
    return docs.select(
        "doc_id", F.col("source"),
        C.synth_dirty_expr(F.col("text"), F.col("doc_id")).alias("text"))


def test_dataset_card_cleaning_section_matches_report(spark):
    """The card's cleaning rows equal cleaning_report's own per-doc
    signals re-aggregated; the default card has no cleaning section."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    df = _dirty_docs(spark)
    card = {(r["section"], r["metric"]): r["value"]
            for r in dataset_card(df, cleaning_section=True).collect()}
    rep = C.cleaning_report(df).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("changed")).alias("dmg"),
        F.sum("n_control").alias("tc"),
        F.sum("n_zero_width").alias("tz"),
        F.sum("n_unicode_space").alias("ts"),
        F.sum("n_chars").alias("chars")).collect()[0]
    assert card[("cleaning", "damaged_doc_fraction")] == \
        sig6_py(int(rep["dmg"]) / int(rep["n"]))
    tot = int(rep["tc"]) + int(rep["tz"]) + int(rep["ts"])
    assert card[("cleaning", "damaged_char_fraction")] == \
        sig6_py(tot / int(rep["chars"]))
    assert card[("cleaning", "control_chars")] == str(int(rep["tc"]))
    assert card[("cleaning", "zero_width_chars")] == str(int(rep["tz"]))
    assert card[("cleaning", "unicode_space_chars")] == \
        str(int(rep["ts"]))
    default = dataset_card(df).collect()
    assert not [r for r in default if r["section"] == "cleaning"]


def test_by_source_cleaning_rows_equal_corpus_slices(spark):
    """Each source's cleaning rows == the corpus card's cleaning
    section on that source's slice alone; the flag-off card is
    byte-identical to before."""
    from flink_descriptive_stats_spark.operators.quality import (
        dataset_card, dataset_card_by_source)
    df = _dirty_docs(spark)
    per = {(r["source"], r["metric"]): r["value"]
           for r in dataset_card_by_source(
               df, cleaning_section=True).collect()
           if r["metric"].startswith("cleaning_")}
    assert per, "no cleaning rows emitted"
    srcs = [r["source"] for r in df.select("source").distinct().collect()]
    for s in srcs[:3]:
        card = {r["metric"]: r["value"]
                for r in dataset_card(df.where(F.col("source") == s),
                                      cleaning_section=True).collect()
                if r["section"] == "cleaning"}
        for m, v in card.items():
            assert per[(s, f"cleaning_{m}")] == v, (s, m)
    base = dataset_card_by_source(df).collect()
    assert not [r for r in base if r["metric"].startswith("cleaning_")]


def test_card_monitor_cleaning_streams_exactly(spark, tmp_path):
    """Streaming cleaning rows == the batch card's cleaning section
    after N micro-batches, including across a restart (all metrics are
    sum-monoids)."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    df = _dirty_docs(spark)
    chunks = str(tmp_path / "chunks")
    df.repartition(3).write.parquet(chunks)
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(chunks))
        q = start_card_monitor(stream, sink, state_path=state,
                               checkpoint_path=ckpt,
                               cleaning_section=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {r["metric"]: r["value"]
                for r in spark.read.parquet(sink).collect()
                if r["section"] == "cleaning"}

    def _want(frame):
        return {r["metric"]: r["value"]
                for r in dataset_card(frame,
                                      cleaning_section=True).collect()
                if r["section"] == "cleaning"}

    assert _run() == _want(df)
    more = spark.createDataFrame(
        [(1000, "late \x07damaged​ doc", "sZ")],
        "doc_id bigint, text string, source string")
    more.coalesce(1).write.mode("append").parquet(chunks)
    assert _run() == _want(df.unionByName(more))


def test_curate_corpus_clean_stage(spark):
    """curate_corpus(clean=True) rewrites text through clean_text_expr
    FIRST: two docs differing only by invisible damage dedup together
    (they don't without the stage), and the result equals curating the
    pre-cleaned frames."""
    from flink_descriptive_stats_spark.operators import cleaning as C
    from flink_descriptive_stats_spark.operators.quality import \
        curate_corpus
    # damage INSIDE a word: canonical dedup maps the ZWSP run to
    # a space ("jum ps" != "jumps"), so only the clean stage
    # unifies the pair
    rows = [(1, "the quick brown fox jumps over dogs", "en"),
            (2, "the quick brown fox jum\u200bps over dogs", "en"),
            (3, "an entirely different document body here", "en")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, "
                                     "lang string")
    holdout = spark.createDataFrame(
        [(9, "held out text", "en")], "doc_id bigint, text string, "
                                      "lang string")
    plain = {r["doc_id"] for r in curate_corpus(df, holdout, min_score=0.0).collect()}
    cleaned = {r["doc_id"]
               for r in curate_corpus(df, holdout, clean=True,
                             min_score=0.0).collect()}
    assert {1, 2} <= plain            # damage splits the dup group
    assert not {1, 2} <= cleaned      # cleaned: they collapse to one
    pre = df.withColumn("text", C.clean_text_expr(F.col("text")))
    pre_h = holdout.withColumn("text", C.clean_text_expr(F.col("text")))
    want = {r["doc_id"] for r in curate_corpus(pre, pre_h, min_score=0.0).collect()}
    assert cleaned == want


def test_dataset_card_empty_corpus_degenerate(spark):
    """An empty (or all-NULL-text) drop yields the degenerate card —
    zero counts, NULL fractions/labels, same (section, metric) shape —
    on BOTH routes, instead of an ANSI divide-by-zero abort (the
    pre-existing crash a review of the cleaning section surfaced)."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    empty = spark.createDataFrame([], "doc_id bigint, text string, "
                                      "source string")
    allnull = spark.createDataFrame(
        [(1, None, "s")], "doc_id bigint, text string, source string")
    for frame in (empty, allnull):
        for sp in (True, False):
            vals = {(r["section"], r["metric"]): r["value"]
                    for r in dataset_card(frame, cleaning_section=True,
                                          single_pass=sp).collect()}
            assert vals[("corpus", "n_docs")] == "0"
            assert vals[("lang", "top_lang")] is None
            assert vals[("cleaning", "control_chars")] == "0"
            assert vals[("cleaning", "damaged_doc_fraction")] is None


def test_dependency_empty_inputs_raise_clearly(spark):
    from flink_descriptive_stats_spark.operators import dependencies as DP
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one spec"):
        DP.inclusion_dependencies([])
    with _pytest.raises(ValueError, match="at least one table"):
        DP.fk_discover({})


def test_card_monitor_cleaning_config_guard(spark, tmp_path):
    """Restarting the card monitor with a different cleaning_section
    than the snapshot was folded with must REFUSE to merge (r11,
    ADVICE fix): the cleaning denominators (n, nch) count every doc
    folded, so a snapshot folded without the cleaning projection
    cannot be continued with it — same contract as the constraint/
    profile/histogram/refint monitors."""
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    df = _dirty_docs(spark)
    chunks = str(tmp_path / "chunks")
    df.coalesce(1).write.parquet(chunks)

    def _run(state, ckpt, flag):
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(chunks))
        q = start_card_monitor(stream, str(tmp_path / "sink"),
                               state_path=state, checkpoint_path=ckpt,
                               cleaning_section=flag)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _run(state, ckpt, True)
    with pytest.raises(Exception) as ei:
        _run(state, str(tmp_path / "ckpt2"), False)
    assert "refusing to merge" in str(ei.value)
    # matching config restarts fine
    _run(state, str(tmp_path / "ckpt3"), True)


def test_by_source_cleaning_null_source_excluded(spark):
    """A NULL source must not crash the by-source cleaning sort (r11,
    ADVICE fix): the row is excluded from every slice, matching the
    corpus card's count_distinct(source) semantics."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card_by_source
    df = spark.createDataFrame(
        [(1, "clean doc one", "sA"),
         (2, "bell\x07damage", None),
         (3, "clean doc two", "sB")],
        "doc_id bigint, text string, source string")
    out = dataset_card_by_source(df, cleaning_section=True).collect()
    srcs = {r["source"] for r in out
            if r["metric"] == "cleaning_damaged_doc_fraction"}
    assert srcs == {"sA", "sB"}
    dmg = {r["source"]: r["value"] for r in out
           if r["metric"] == "cleaning_damaged_doc_fraction"}
    assert dmg["sA"] == "0e0" and dmg["sB"] == "0e0"
