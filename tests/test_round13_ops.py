"""Round-13 operator pins: dict-threshold boilerplate triage (ADVICE
r12), the stable approx-card gate, tokenizer-true BFD packing
(n_tokens_col), and the dedup_lines max_lines guard."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_boilerplate_ngrams_accepts_per_length_min_df(spark):
    """The triage view accepts the remover's {n: df} dict, so a
    dict-threshold remove_repeated_spans can be previewed with
    MATCHING parameters (ADVICE r12): per-length thresholds filter
    per length, and invalid dicts raise the remover's own messages
    instead of an opaque Column-comparison error."""
    from flink_descriptive_stats_spark.operators.dedup import (
        SPAN_HEADER, SPAN_SHORT, boilerplate_ngrams)
    rows = []
    for i in range(10):
        body = f"distinct-{i} on subject-{i * 19} tail-{i * 23}"
        rows.append((i, SPAN_HEADER + " " + body + " " + SPAN_SHORT))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # scalar baseline: both the 7-word header (all its 4..7-gram
    # forms) and the 4-word banner are at df=10
    flat = boilerplate_ngrams(df, min_ngram=4, min_df=10, k=50,
                              max_ngram=7).collect()
    got_flat = {(r["ngram"], r["ngram_len"]) for r in flat}
    assert (SPAN_HEADER.lower(), 7) in got_flat
    assert (SPAN_SHORT.lower(), 4) in got_flat
    # dict form: an impossible threshold for length 4 hides the
    # banner while the header's longer forms stay — exactly what the
    # same dict does in remove_repeated_spans
    strict4 = {4: 11, 5: 10, 6: 10, 7: 10}
    out = boilerplate_ngrams(df, min_ngram=4, min_df=strict4, k=50,
                             max_ngram=7).collect()
    got = {(r["ngram"], r["ngram_len"]) for r in out}
    assert (SPAN_HEADER.lower(), 7) in got
    assert (SPAN_SHORT.lower(), 4) not in got
    assert all(r["ngram_len"] != 4 for r in out)
    # lengths >= 5 are untouched by the stricter 4-threshold
    assert {p for p in got_flat if p[1] >= 5} == \
        {p for p in got if p[1] >= 5}
    # validation parity with the remover
    with pytest.raises(ValueError, match="max_ngram > min_ngram"):
        boilerplate_ngrams(df, min_ngram=4, min_df=strict4)
    with pytest.raises(ValueError, match="missing lengths"):
        boilerplate_ngrams(df, min_ngram=4, min_df={4: 10},
                           max_ngram=7)
    with pytest.raises(ValueError, match=">= 2"):
        boilerplate_ngrams(df, min_ngram=4,
                           min_df={4: 1, 5: 2, 6: 2, 7: 2},
                           max_ngram=7)


def test_boilerplate_dict_preview_matches_remover(spark):
    """End-to-end triage contract: mining with a {n: df} dict in
    boilerplate_ngrams previews EXACTLY the n-grams that the same
    dict makes remove_repeated_spans remove — lengths whose
    threshold excludes them leave their words in place."""
    from flink_descriptive_stats_spark.operators.dedup import (
        SPAN_SHORT, boilerplate_ngrams, remove_repeated_spans)
    rows = []
    for i in range(10):
        body = f"unique-{i} words-{i * 7} here-{i * 13}"
        rows.append((i, body + " " + SPAN_SHORT))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    hide = {4: 11, 5: 11}      # banner is df=10 -> below both
    show = {4: 10, 5: 11}
    prev_hide = boilerplate_ngrams(df, min_ngram=4, min_df=hide,
                                   k=50, max_ngram=5).collect()
    prev_show = boilerplate_ngrams(df, min_ngram=4, min_df=show,
                                   k=50, max_ngram=5).collect()
    assert prev_hide == []
    assert {(r["ngram"], r["ngram_len"]) for r in prev_show} == \
        {(SPAN_SHORT.lower(), 4)}
    rm_hide = remove_repeated_spans(df, min_ngram=4, min_df=hide,
                                    max_ngram=5).collect()
    rm_show = remove_repeated_spans(df, min_ngram=4, min_df=show,
                                    max_ngram=5).collect()
    assert all(r["n_tokens_removed"] == 0 for r in rm_hide)
    assert all(r["n_tokens_removed"] == 4 for r in rm_show)


def test_approx_card_stable_rows_equal_exact_card(spark):
    """The r13 gate contract (VERDICT r12 missing #1): filtering the
    exact=False card to its deterministic rows (the complement of
    CARD_SKETCHED_METRICS) yields VALUES identical to the exact card's
    matching rows — that identity is what lets the 100 TB-default path
    hash-gate against the exact card's oracle SQL."""
    from flink_descriptive_stats_spark.operators.quality import (
        CARD_SKETCHED_METRICS, dataset_card)
    from flink_descriptive_stats_spark.sources.tables import load_table
    docs = load_table(spark, SF_DIR, "documents")
    exact = {(r["section"], r["metric"]): r["value"]
             for r in dataset_card(docs).collect()
             if r["metric"] not in CARD_SKETCHED_METRICS}
    stable = {(r["section"], r["metric"]): r["value"]
              for r in dataset_card(docs, exact=False)
              .where(~F.col("metric").isin(*CARD_SKETCHED_METRICS))
              .collect()}
    assert stable == exact
    assert len(stable) == 11    # 14 card rows minus the sketched 3


def _pack_key(rows):
    return sorted((r["id"], r["shard"], r["pack_id"], r["n_tokens"])
                  for r in rows)


def test_pack_bfd_n_tokens_col_default_is_byte_identical(spark):
    """The r13 tokenizer-true path (VERDICT r12 missing #2), pin 1:
    pointing n_tokens_col at a MATERIALIZED whitespace-token-count
    column reproduces the regex default exactly — same assignment,
    same summary — so the precomputed-budget path is a pure budget
    swap, not a second packing semantics."""
    from flink_descriptive_stats_spark.functions import hashing as H
    from flink_descriptive_stats_spark.operators.sampling import (
        pack_sequences_bfd, pack_stats_bfd)
    docs = (spark.read.parquet(SF_DIR + "/documents.parquet")
            .limit(200))
    mat = docs.withColumn(
        "wc", F.size(H.tokens_expr(F.col("text"))).cast("bigint"))
    base = pack_sequences_bfd(docs, max_tokens=128).collect()
    via_col = pack_sequences_bfd(mat, max_tokens=128,
                                 n_tokens_col="wc").collect()
    assert _pack_key(base) == _pack_key(via_col) and base
    s_base = pack_stats_bfd(docs, max_tokens=128).collect()
    s_col = pack_stats_bfd(mat, max_tokens=128,
                           n_tokens_col="wc").collect()
    assert s_base == s_col


def test_pack_bfd_budgets_by_bpe_token_counts(spark):
    """Pin 2: the documented BPE route — bpe_token_stats counts joined
    on as n_tokens_col — packs by the TOKENIZER's counts: the
    assignment equals packing synthetic docs of exactly n_bpe_tokens
    whitespace words (regex count == BPE count by construction), and
    differs from the whitespace packing whenever fertility > 1."""
    from flink_descriptive_stats_spark.operators.sampling import \
        pack_sequences_bfd
    from flink_descriptive_stats_spark.operators.text import \
        bpe_token_stats
    docs = (spark.read.parquet(SF_DIR + "/documents.parquet")
            .where(F.col("text").isNotNull()).limit(80))
    counts = bpe_token_stats(docs, n_merges=20)
    joined = docs.join(counts.select(F.col("id").alias("doc_id"),
                                     "n_bpe_tokens"), "doc_id")
    via_bpe = pack_sequences_bfd(joined, max_tokens=256,
                                 n_tokens_col="n_bpe_tokens").collect()
    # synthetic mirror: docs whose whitespace count IS the BPE count
    synth = counts.select(
        F.col("id").alias("doc_id"),
        F.array_join(F.array_repeat(F.lit("w"),
                                    F.col("n_bpe_tokens").cast("int")),
                     " ").alias("text"))
    via_synth = pack_sequences_bfd(synth, max_tokens=256).collect()
    assert _pack_key(via_bpe) == _pack_key(via_synth) and via_bpe
    # and BPE fertility > 1 makes it a genuinely different packing
    ws = pack_sequences_bfd(docs, max_tokens=256).collect()
    assert {r["id"]: r["n_tokens"] for r in via_bpe} != \
        {r["id"]: r["n_tokens"] for r in ws}


def test_temperature_mixture_token_mass_law(spark):
    """The r13 weight_col mixture law: unit weights reproduce the
    doc-count law EXACTLY (t_s = n_s), and on a corpus whose sources
    differ in doc length the token law keeps a SMALLER share of the
    long-doc-heavy source than the doc law (its mass share exceeds its
    doc share, so its per-doc keep rate drops). NULL-weight rows are
    out of scope."""
    from flink_descriptive_stats_spark.operators.sampling import \
        temperature_mixture_sample
    rows = []
    for i in range(200):
        # source 'long': few docs, 10x tokens each; 'short': many docs
        src = "long" if i < 40 else "short"
        rows.append((i, src, 1000 if src == "long" else 100))
    rows.append((900, "short", None))      # NULL weight: out of scope
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tok bigint")
    ones = df.withColumn("one", F.lit(1))
    base = temperature_mixture_sample(df, alpha=0.5,
                                      target_fraction=0.5)
    unit = temperature_mixture_sample(ones, alpha=0.5,
                                      target_fraction=0.5,
                                      weight_col="one")
    assert sorted(r["doc_id"] for r in base.collect()) == \
        sorted(r["doc_id"] for r in unit.collect())
    tok = temperature_mixture_sample(df, alpha=0.5,
                                     target_fraction=0.5,
                                     weight_col="n_tok").collect()
    kept_tok = {s: sum(1 for r in tok if r["source"] == s)
                for s in ("long", "short")}
    kept_doc = {s: sum(1 for r in base.collect()
                       if r["source"] == s)
                for s in ("long", "short")}
    # 'long' holds 40/200 docs but 40k/56k tokens: the token law must
    # keep fewer of its docs than the doc law (which UPsamples it)
    assert kept_tok["long"] < kept_doc["long"], (kept_tok, kept_doc)
    assert all(r["doc_id"] != 900 for r in tok)


def test_fold_credit_is_scan_order_independent():
    """r13 self-review: fold provenance must be a pure function of the
    snapshot SET. A=3s (dominant) and B=4s (dominated) must yield the
    SAME folded_from in either scan order: only A, because only A
    supplies a final minimum that beats the current run."""
    import bench
    times = {"q": 5.0}
    a, b = ("A.json", {"q": 3.0}), ("B.json", {"q": 4.0})
    for order in ([a, b], [b, a]):
        fold = dict(times)
        for _, pq in order:
            bench._fold_in(fold, times, pq)
        assert fold == {"q": 3.0}
        assert bench._fold_credit(fold, times, order) == ["A.json"]
    # a snapshot equal to the current run contributes nothing
    fold = dict(times)
    bench._fold_in(fold, times, {"q": 5.0})
    assert bench._fold_credit(fold, times, [("C.json", {"q": 5.0})]) == []
    # a currently-failing query never takes a prior time (r11 guard)
    times_f = {"q": -1.0}
    fold = dict(times_f)
    bench._fold_in(fold, times_f, {"q": 3.0})
    assert fold == {"q": -1.0}
    assert bench._fold_credit(fold, times_f,
                              [("D.json", {"q": 3.0})]) == []


def test_persist_pos_registry_is_bounded(spark):
    """The narrow-frame cache registry (r13): DataFrame.persist entries
    are never GC-collected, so the span/shingle persists must self-evict
    beyond the last K or a long session leaks storage until it starves
    execution (measured: star-CC 3.8s alone vs ~11s late in a bench
    that had leaked every prior persist). Eviction is safe — an evicted
    frame recomputes. Pin: after K+4 persists only K stay registered,
    evicted frames report StorageLevel NONE, survivors stay cached."""
    from flink_descriptive_stats_spark.operators.dedup import (
        _PERSISTED_NARROW, _PERSISTED_NARROW_KEEP, _persist_pos)
    _PERSISTED_NARROW.clear()
    frames = [_persist_pos(spark.range(i + 1, numPartitions=1))
              for i in range(_PERSISTED_NARROW_KEEP + 4)]
    assert len(_PERSISTED_NARROW) == _PERSISTED_NARROW_KEEP
    for f in frames[:4]:                       # evicted
        assert not f.storageLevel.useMemory, f.storageLevel
    for f in frames[4:]:                       # survivors
        assert f.storageLevel.useMemory, f.storageLevel
        assert f.count() > 0                   # still correct
    _PERSISTED_NARROW.clear()
    for f in frames[4:]:
        f.unpersist(blocking=False)


def test_dedup_lines_max_lines_guard(spark):
    """The r13 degenerate-page guard: a doc with more than max_lines
    lines passes through UNTOUCHED (text byte-identical, removals 0,
    n_lines still reported), normal pages dedup exactly as before,
    max_lines=None disables the guard, and the plan stays ONE
    map-only codegen Project — the guard is a row-local size test,
    not a second pass."""
    from flink_descriptive_stats_spark.operators.dedup import (
        dedup_lines, dedup_lines_rewrite)
    big = "\n".join(["dup line"] * 10 + [f"u{i}" for i in range(5)])
    small = "a\ndup\ndup\nb"
    df = spark.createDataFrame([(0, big), (1, small)],
                               "doc_id bigint, text string")
    out = {r["id"]: r for r in dedup_lines(df, max_lines=10).collect()}
    assert out[0]["text_clean"] == big          # 15 lines > 10: skipped
    assert out[0]["n_lines_removed"] == 0
    assert out[0]["n_lines"] == 15              # the skip is visible
    assert out[1]["text_clean"] == "a\ndup\nb"  # 4 lines: deduped
    assert out[1]["n_lines_removed"] == 1
    # None disables the guard; the default (100k) never fires on pages
    full = {r["id"]: r
            for r in dedup_lines(df, max_lines=None).collect()}
    assert full[0]["n_lines_removed"] == 9
    dflt = {r["id"]: r for r in dedup_lines(df).collect()}
    assert dflt[0]["n_lines_removed"] == 9
    # rewrite form honors the same guard
    rw = {r["doc_id"]: r["text"]
          for r in dedup_lines_rewrite(df, max_lines=10).collect()}
    assert rw[0] == big and rw[1] == "a\ndup\nb"
    # map-only plan pin unchanged with the guard in the expression
    plan = (dedup_lines(df, max_lines=10)
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("Exchange", "Join", "Python", "Sort"):
        assert bad not in plan, plan
