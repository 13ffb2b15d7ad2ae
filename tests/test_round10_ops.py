"""Round-10 tests: the markup/text-extraction family (VERDICT r9 ask
#1) with adversarial-markup pins and the Spark<->DuckDB extraction
parity sweep, the dataset-card markup section, fs.atomic_rename
enforcement at the swap sites (ask #2), the by-source media section
(ask #4), the flat-PQ refine recall sweep (ask #5), media counters in
the streaming card monitor (ask #6), and the round's ADVICE items."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ markup /
# text extraction (VERDICT r9 ask #1)

def _extract_one(spark, html: str) -> str | None:
    from flink_descriptive_stats_spark.operators import markup as M
    r = (spark.createDataFrame([(1, html)], "doc_id bigint, html string")
         .select(M.extract_text_expr(F.col("html")).alias("t"))
         .collect()[0])
    return r["t"]


def test_extract_text_basic_page(spark):
    """Full page: style/script/nav blocks (INCLUDING nav link text) and
    comments are dropped, remaining tag content is kept, whitespace
    collapses."""
    html = ('<html><head><title>T</title><style>p{x:1}</style></head>'
            '<body><nav><a href="/">home</a></nav>'
            '<h1>Head</h1>\n\n<p>body   text</p>'
            '<script>var a = 1;</script><!-- c --></body></html>')
    assert _extract_one(spark, html) == "T Head body text"


def test_extract_text_nested_tags_and_case(spark):
    assert _extract_one(
        spark, '<DIV><div class="a"><P>a</P> <EM>b</EM></div></DIV>'
    ) == "a b"


def test_extract_text_entities_order(spark):
    """&amp; decodes LAST: &amp;lt; must yield the literal text &lt;
    (not <), and unknown entities stay verbatim."""
    assert _extract_one(
        spark, "x &amp;lt; y &lt;z&gt; &quot;q&quot; &#39;s&#39; "
               "&nbsp; &broken; end"
    ) == 'x &lt; y <z> "q" \'s\' &broken; end'


def test_extract_text_stray_lt_survives(spark):
    """A stray comparison is NOT a tag (the char after < must be a
    letter or !)."""
    assert _extract_one(spark, "5 < 6 and <em>7 > 2</em>") \
        == "5 < 6 and 7 > 2"


def test_extract_text_script_with_markup_strings(spark):
    """Tag-looking strings INSIDE a script block go with the block."""
    html = ('<script type="text/javascript">if (1 < 2) '
            '{ emit("<p>fake</p>"); }</script>real')
    assert _extract_one(spark, html) == "real"


def test_extract_text_multiline_blocks(spark):
    html = "a<!-- multi\nline\ncomment -->b<style>\nbody{}\n</style>c"
    assert _extract_one(spark, html) == "a b c"


def test_extract_text_known_limitations_pinned(spark):
    """Documented regex-extractor behavior (module docstring): an
    UNCLOSED script leaks its body; an attribute value containing a
    literal > ends the tag early; CDATA with no > in its payload drops
    as one pseudo-tag."""
    assert _extract_one(spark, "<script>leaked body") == "leaked body"
    assert _extract_one(spark, '<a title="a>b">x</a>') == 'b">x'
    assert _extract_one(spark, "a <![CDATA[x<y]]> b") == "a b"


def test_extract_text_duckdb_parity_adversarial(spark):
    """The DuckDB oracle pipeline (_duck_extract_text) and the Spark
    expression must agree character-for-character on the adversarial
    corpus — the parity the gate checks on fixture shells, extended to
    hand-written hostile markup."""
    import duckdb

    from flink_descriptive_stats_spark.operators import markup as M
    cases = [
        "<p>plain</p>",
        "<DIV><div><P>a</P> <EM>b</EM></div></DIV>",
        "x &amp;lt; y &lt;z&gt; &quot;q&quot; &#39;s&#39; &broken;",
        "5 < 6 and <em>7 > 2</em>",
        '<script>if (1 < 2) { emit("<p>f</p>"); }</script>real',
        "a<!-- multi\nline -->b<style>\nbody{}\n</style>c",
        "<script>leaked body",
        'attr <a title="a>b">x</a>',
        "a <![CDATA[x<y]]> b",
        "<nav><a href=\"/\">home</a> | <a href=\"/x\">x</a></nav>kept",
        "   lots\t\tof\n\nspace   ",
        "",
        "<br/><BR><br >line",
    ]
    got_spark = [r["t"] for r in spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i bigint, html string")
        .orderBy("i")
        .select(M.extract_text_expr(F.col("html")).alias("t"))
        .collect()]
    from flink_descriptive_stats_spark.oracle_pipeline import \
        _duck_extract_text
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {_duck_extract_text('?')}",
                    [c]).fetchone()[0]
        for c in cases
    ]
    assert got_spark == got_duck


def test_markup_density_signals(spark):
    from flink_descriptive_stats_spark.operators import markup as M
    rows = [
        (0, None),
        (1, "plain prose only"),
        (2, '<nav><a href="/">x</a><a href="/y">y</a></nav>'
            "<script>s</script><p>t</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    out = {r["id"]: r for r in M.markup_density(df).collect()}
    assert set(out) == {1, 2}          # NULL html out of scope
    r1, r2 = out[1], out[2]
    assert r1["markup_density"] == "0e0" and r1["n_tags"] == 0
    assert r1["raw_len"] == r1["extracted_len"] == len("plain prose only")
    assert r2["extracted_len"] == 1    # only "t" survives
    assert r2["n_links"] == 2 and r2["n_scripts"] == 1
    assert r2["n_tags"] == 10          # every tag incl. closers
    assert float(r2["markup_density"][:7]) > 0  # mostly chrome


def test_markup_density_empty_doc_zero(spark):
    from flink_descriptive_stats_spark.operators import markup as M
    out = M.markup_density(
        spark.createDataFrame([(1, "")], "doc_id bigint, html string")
    ).collect()[0]
    assert out["markup_density"] == "0e0" and out["raw_len"] == 0


def test_dataset_card_markup_section(spark):
    """Card integration pin: the markup section's numbers equal the
    bounded aggregate of markup_density's own per-doc output; the
    text-only card is byte-identical to html_col=None."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import markup as M
    from flink_descriptive_stats_spark.operators import quality as Q
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    html = docs.select(
        "doc_id", "text", "source",
        M.synth_html_expr(F.col("text"), F.col("doc_id")).alias("html"))

    base = Q.dataset_card(html).collect()
    assert Q.dataset_card(docs).collect() == base  # unchanged w/o html

    card = Q.dataset_card(html, html_col="html").collect()
    assert card[:len(base)] == base
    mk = {r["metric"]: r["value"] for r in card[len(base):]
          if r["section"] == "markup"}
    per = M.markup_density(html).withColumn(
        "dens", 1.0 - F.col("extracted_len").cast("double")
        / F.col("raw_len").cast("double")).collect()
    dens = [r["dens"] if r["raw_len"] else 0.0 for r in per]
    assert mk["n_html_docs"] == str(len(per))
    assert mk["mean_markup_density"] == sig6_py(sum(dens) / len(dens))
    assert mk["high_markup_fraction"] == sig6_py(
        sum(d > 0.5 for d in dens) / len(dens))
    assert mk["mean_links_per_doc"] == sig6_py(
        sum(r["n_links"] for r in per) / len(per))


# ------------------------------------------------------------ fsio:
# atomic_rename enforcement + .tmp reader self-heal (VERDICT r9 ask #2,
# ADVICE r9 #1)

class _NonAtomicFS:
    """LocalFS behavior flagged as an S3-family store."""

    def __init__(self):
        from flink_descriptive_stats_spark.functions import fsio
        self._inner = fsio.LocalFS()
        self.atomic_rename = False

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def write_text_atomic(self, p, text):
        from flink_descriptive_stats_spark.functions.fsio import \
            warn_non_atomic
        warn_non_atomic(self, p, "sidecar write_text_atomic")
        self._inner.write_text_atomic(p, text)


def test_compact_swap_warns_on_non_atomic_fs(spark, tmp_path,
                                             monkeypatch):
    """VERDICT r9 ask #2: compact_index's two-rename swap must SURFACE
    the degraded crash regime on a store whose rename is copy+delete —
    the fsio docstring promised callers warn; now they do."""
    from flink_descriptive_stats_spark.functions.fsio import \
        NonAtomicRenameWarning
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "pq")
    S.write_pq_index(emb.where(F.col("vec_id") % 2 == 0), idx)
    S.append_pq_index(emb.where(F.col("vec_id") % 2 == 1), idx)
    stub = _NonAtomicFS()
    monkeypatch.setattr(S, "get_fs", lambda path, spark=None: stub)
    with pytest.warns(NonAtomicRenameWarning, match="compact_index"):
        S.compact_index(spark, idx)
    # the swap itself still completed correctly
    assert sorted(S.pq_index_topk(emb, idx).limit(1).collect()) \
        is not None


def test_sidecar_write_warns_on_non_atomic_fs(tmp_path):
    from flink_descriptive_stats_spark.functions.fsio import \
        NonAtomicRenameWarning
    stub = _NonAtomicFS()
    p = str(tmp_path / "meta.json")
    with pytest.warns(NonAtomicRenameWarning, match="write_text_atomic"):
        stub.write_text_atomic(p, "{}")
    assert open(p).read() == "{}"


def test_local_lifecycle_emits_no_warning(tmp_path, recwarn):
    """POSIX rename is atomic: the local path stays warning-free."""
    from flink_descriptive_stats_spark.functions import fsio
    fs = fsio.LocalFS()
    p = str(tmp_path / "meta.json")
    fs.write_text_atomic(p, "{}")
    assert not [w for w in recwarn
                if issubclass(w.category, fsio.NonAtomicRenameWarning)]


def test_reader_heals_tmp_crash_window(tmp_path):
    """ADVICE r9 #1: a crash between HadoopFS's delete(p) and
    rename(tmp, p) leaves only p.tmp; the reader restores it."""
    from flink_descriptive_stats_spark.functions import fsio
    fs = fsio.LocalFS()
    p = str(tmp_path / "meta.json")
    fs.write_text_atomic(p, '{"m": 16}')
    os.rename(p, p + ".tmp")        # simulate the crash window
    assert fsio.read_text_recovering(fs, p) == '{"m": 16}'
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
    # and a normal read (no crash) is unaffected
    assert fsio.read_text_recovering(fs, p) == '{"m": 16}'


def test_index_search_survives_meta_crash_window(spark, tmp_path):
    """End to end: rename meta.json into its .tmp (the crash shape) and
    the next search self-heals and answers identically."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "pq")
    S.write_pq_index(emb, idx)
    before = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    meta = os.path.join(idx, "meta.json")
    os.rename(meta, meta + ".tmp")
    after = sorted(map(tuple, S.pq_index_topk(emb, idx).collect()))
    assert after == before and os.path.exists(meta)


# ------------------------------------------------------------ flat-PQ
# refine recall sweep (VERDICT r9 ask #5)

def test_refine_sweep_flat_pq_monotone_to_one(spark, tmp_path):
    """Recall is monotone non-decreasing in refine and hits 1.0 once
    refine*k covers the corpus (the shortlist then IS the corpus and
    the exact re-rank recovers brute force)."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = (spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
           .where(F.col("vec_id") < 120))
    idx = str(tmp_path / "pq")
    S.write_pq_index(emb, idx)
    # sig6 strings ("9600000e-7", "1e0") are valid float literals
    out = {r["refine"]: float(r["recall"])
           for r in S.index_refine_calibration(
               emb, idx, k=5, refines=(1, 2, 8, 24)).collect()}
    vals = [out[r] for r in (1, 2, 8, 24)]
    assert vals == sorted(vals)
    assert vals[-1] == 1.0   # refine*k = 120 >= corpus
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_refine_sweep_ivf_pq_fixed_probe(spark, tmp_path):
    """On IVF-PQ the sweep fixes n_probe (default: all cells) so refine
    is the only moving knob; full-probe max-refine equals brute force."""
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = (spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
           .where(F.col("vec_id") < 120))
    idx = str(tmp_path / "ivfpq")
    S.write_ivf_pq_index(emb, idx, n_cells=4)
    rows = S.index_refine_calibration(
        emb, idx, k=5, refines=(1, 24)).collect()
    got = {r["refine"]: float(r["recall"]) for r in rows}
    assert got[24] == 1.0 and got[1] <= got[24]
    # flat-only knob misuse is loud
    with pytest.raises(ValueError, match="n_probe on a flat PQ"):
        idx2 = str(tmp_path / "pq2")
        S.write_pq_index(emb, idx2)
        S.index_refine_calibration(emb, idx2, n_probe=2)


def test_recall_calibration_raise_points_at_refine_sweep(spark,
                                                         tmp_path):
    from flink_descriptive_stats_spark.operators import similarity as S
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    idx = str(tmp_path / "pqflat")
    S.write_pq_index(emb.where(F.col("vec_id") < 60), idx)
    with pytest.raises(ValueError, match="index_refine_calibration"):
        S.index_recall_calibration(emb, idx)


# ------------------------------------------------------------ by-source
# media section (VERDICT r9 ask #4)

def _mixed_media_frame(spark):
    from tests.test_round9_ops import _ppm, _wav
    rows = []
    for i in range(20):
        src = "sA" if i < 10 else "sB"
        j = i % 10
        if j in (0, 1):
            payload = _ppm(f"{src}A")      # within-source image pair
        elif j <= 3:
            payload = _ppm(f"{src}solo{j}")
        elif j in (4, 5):
            payload = _wav(f"{src}X")      # within-source audio pair
        elif j == 6:
            payload = _wav(f"{src}clip")
        elif j == 7:
            payload = bytearray(b"JFIF not a known container")
        elif j == 8:
            payload = None
        else:
            payload = bytearray(b"BM" + b"\x01" * 30)  # undecodable BMP
        rows.append((i, f"doc {i} words and more words", src, payload))
    return spark.createDataFrame(
        rows,
        "doc_id bigint, text string, source string, payload binary")


def test_by_source_media_rows_equal_corpus_card_slices(spark):
    """VERDICT r9 ask #4: each source's media rows equal the corpus
    card's media section computed on that source's slice alone — the
    'which source is dumping broken media' triage view."""
    from flink_descriptive_stats_spark.operators import quality as Q
    df = _mixed_media_frame(spark)
    by_src = Q.dataset_card_by_source(df, payload_col="payload",
                                      media_kind="auto").collect()
    for s in ("sA", "sB"):
        got = [(r["metric"], r["value"]) for r in by_src
               if r["source"] == s and r["metric"].startswith("media")]
        want = [(f"{sec}_{m}", v) for sec, m, v in
                ((r["section"], r["metric"], r["value"]) for r in
                 Q.dataset_card(df.where(F.col("source") == s),
                                payload_col="payload",
                                media_kind="auto").collect())
                if sec.startswith("media")]
        assert got == want, s


def test_by_source_media_single_kind_and_unchanged_without(spark):
    from flink_descriptive_stats_spark.operators import quality as Q
    df = _mixed_media_frame(spark)
    img = df.where(~F.col("payload").isNull())
    base = Q.dataset_card_by_source(df).collect()
    # no payload_col -> byte-identical to before
    assert Q.dataset_card_by_source(
        df, payload_col=None).collect() == base
    # a payload_col absent from the frame is a no-op too
    assert Q.dataset_card_by_source(
        df.drop("payload"), payload_col="payload").collect() == base
    # single-kind: media_* metrics present per source, corpus-slice equal
    by_src = Q.dataset_card_by_source(img, payload_col="payload",
                                      media_kind="image").collect()
    got = [(r["metric"], r["value"]) for r in by_src
           if r["source"] == "sA" and r["metric"].startswith("media")]
    want = [(f"media_{m}", v) for sec, m, v in
            ((r["section"], r["metric"], r["value"]) for r in
             Q.dataset_card(img.where(F.col("source") == "sA"),
                            payload_col="payload",
                            media_kind="image").collect())
            if sec == "media"]
    assert got == want
    # five-pass path appends the same media rows
    by_src5 = Q.dataset_card_by_source(
        img, payload_col="payload", media_kind="image",
        single_pass=False).collect()
    assert [r for r in by_src5 if r["metric"].startswith("media")] \
        == [r for r in by_src if r["metric"].startswith("media")]


# ------------------------------------------------------------ streaming
# card monitor: media counters (VERDICT r9 ask #6) + typed empty-batch
# schema (ADVICE r9 #2)

def test_card_monitor_media_counters_equal_batch(spark, tmp_path):
    """The streaming datasheet's media rows equal the batch card's
    (media_kind='auto') for every sum-monoid metric; the cluster-mass
    row stays batch-only by documented design. Restart resumes the
    media counters losslessly from the versioned state."""
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    df = _mixed_media_frame(spark)
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
                               payload_col="payload")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {(r["section"], r["metric"]): r["value"]
                for r in spark.read.parquet(sink).collect()}

    def _want(frame):
        return {(r["section"], r["metric"]): r["value"]
                for r in dataset_card(frame, payload_col="payload",
                                      media_kind="auto").collect()
                if r["section"].startswith("media")
                and r["metric"] != "neardup_cluster_fraction"}

    got = _run()
    want = _want(df)
    for key, v in want.items():
        assert got[key] == v, (key, v, got.get(key))
    # no cluster row leaks into the stream (declared batch-only)
    assert not [k for k in got if k[1] == "neardup_cluster_fraction"]

    # restart with more payloads (new audio pair within sA)
    from tests.test_round9_ops import _wav
    more = spark.createDataFrame(
        [(100 + i, f"late doc {i}", "sA", _wav("late")) for i in (0, 1)],
        df.schema)
    more.coalesce(1).write.mode("append").parquet(chunks)
    got2 = _run()
    want2 = _want(df.unionByName(more))
    for key, v in want2.items():
        assert got2[key] == v, (key, v, got2.get(key))


def test_card_monitor_empty_first_batch_typed_schema(spark, tmp_path):
    """ADVICE r9 #2: a first micro-batch whose docs are all NULL-text
    used to write a sink parquet with null-typed section/metric columns
    (only value was typed) — Spark then read void columns. All three
    columns are now explicitly string-typed."""
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    df = spark.createDataFrame([(1, None, "s0")],
                               "doc_id bigint, text string, source string")
    chunks = str(tmp_path / "chunks")
    df.write.parquet(chunks)
    sink = str(tmp_path / "sink")
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(chunks))
    q = start_card_monitor(stream, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(sink)
    assert [f.dataType.simpleString() for f in out.schema.fields] \
        == ["string", "string", "string"]
    assert out.count() == 0


# ------------------------------------------------------------ remaining
# ADVICE r9 items: CLI flag conflict (#4), spearman probe post-drop (#5)

def test_cli_media_neardup_rejects_dedup_plus_calibrate(spark, capsys,
                                                        tmp_path):
    """ADVICE r9 #4: --dedup + --calibrate used to silently run dedup
    and drop --calibrate; now the combination is rejected loudly."""
    from tests.test_round9_ops import _ppm
    from flink_descriptive_stats_spark.__main__ import main
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(
        [(i, _ppm(f"x{i}")) for i in range(4)],
        "doc_id bigint, payload binary").write.parquet(src)
    rc = main(["media-neardup", src, "--kind", "image",
               "--dedup", "--calibrate"])
    assert rc == 2
    assert "mutually exclusive" in capsys.readouterr().err


def test_grouped_spearman_budget_probes_post_dropna(spark):
    """ADVICE r9 #5: the group-cardinality budget probe now counts the
    groups that survive listwise deletion — a frame whose over-budget
    groups are all-NULL rows must NOT raise, and results are
    unchanged."""
    from flink_descriptive_stats_spark.operators import extras as X
    rows = []
    for g in range(6):          # 6 raw groups...
        for i in range(4):
            if g < 2:
                rows.append((f"g{g}", float(i), float(i * 2)))
            else:               # ...4 of them all-NULL in the columns
                rows.append((f"g{g}", None, None))
    df = spark.createDataFrame(rows, "grp string, a double, b double")
    out = X.grouped_spearman(df, "grp", ["a", "b"],
                             max_groups=2).collect()
    assert sorted({r["group"] for r in out}) == ["g0", "g1"]
    # and a genuinely over-budget post-drop frame still raises
    with pytest.raises(ValueError, match="grouped_spearman"):
        X.grouped_spearman(
            df.fillna(0.0), "grp", ["a", "b"], max_groups=2).collect()


def test_cli_extract_subcommand(spark, capsys, tmp_path):
    """CLI surface for the markup family: extract emits (id,
    text_extracted); --density emits the chrome signals."""
    from flink_descriptive_stats_spark.__main__ import main
    src = str(tmp_path / "html.parquet")
    spark.createDataFrame(
        [(1, "<p>hello <em>world</em></p><script>x</script>")],
        "doc_id bigint, html string").write.parquet(src)
    rc = main(["extract", src])
    out = capsys.readouterr().out
    assert rc == 0 and "hello world" in out
    rc = main(["extract", src, "--density"])
    out = capsys.readouterr().out
    assert rc == 0 and "markup_density" in out and "n_scripts" in out


def test_cli_ann_index_refine(spark, capsys, tmp_path):
    from flink_descriptive_stats_spark.__main__ import main
    src = os.path.join(SF_DIR, "embeddings.parquet")
    idx = str(tmp_path / "pqidx")
    rc = main(["ann", src, "--method", "index-refine",
               "--index-path", idx, "--refines", "1,4"])
    out = capsys.readouterr().out
    assert rc == 0 and "refine" in out and "recall" in out


# ------------------------------------------------------------ URL /
# domain analysis (round-10 extension: crawl-metadata companion)

def _url_rows(spark, urls):
    from flink_descriptive_stats_spark.operators import urls as U
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string")
    return {r["id"]: r.asDict() for r in U.url_components(df).collect()}


def test_url_components_contract(spark):
    """One row per URL_VARIANTS shell: www host kept, port stripped,
    uppercase host lowered, co.uk reports the documented 2-label
    heuristic, bare domain has depth 0 and no query, malformed row is
    valid=false with all-NULL components."""
    rows = _url_rows(spark, [
        "https://www.example.com/articles/guide",
        "http://news.example.org/a/b/c",
        "https://EXAMPLE.net#frag",
        "https://cdn.static.example.io:8443/assets",
        "http://bbc.co.uk/news?page=2",
        "www.broken-no-scheme.com/x",
    ])
    r = rows[0]
    assert r["valid"] and r["scheme"] == "https"
    assert r["host"] == "www.example.com" and r["domain"] == "example.com"
    assert r["tld"] == "com" and r["path_depth"] == 2
    assert r["has_query"] is False
    assert rows[1]["path_depth"] == 3
    assert rows[1]["domain"] == "example.org"
    r = rows[2]  # uppercase bare domain with fragment
    assert r["host"] == "example.net" and r["path_depth"] == 0
    assert r["has_query"] is False
    r = rows[3]  # explicit port stripped
    assert r["host"] == "cdn.static.example.io"
    assert r["domain"] == "example.io" and r["tld"] == "io"
    r = rows[4]  # documented 2-label heuristic: co.uk, not bbc.co.uk
    assert r["domain"] == "co.uk" and r["tld"] == "uk"
    assert r["has_query"] is True
    r = rows[5]  # no scheme:// -> triage row
    assert r["valid"] is False
    for k in ("scheme", "host", "domain", "tld", "path_depth",
              "has_query"):
        assert r[k] is None, k


def test_url_components_null_urls_excluded(spark):
    from flink_descriptive_stats_spark.operators import urls as U
    df = spark.createDataFrame(
        [(1, "https://a.example.com/x"), (2, None)],
        "doc_id bigint, url string")
    out = U.url_components(df).collect()
    assert [r["id"] for r in out] == [1]


def test_domain_mix_shares(spark):
    """Shares are over VALID rows only and sum to 1; the malformed row
    is excluded from the denominator."""
    from flink_descriptive_stats_spark.operators import urls as U
    df = spark.createDataFrame(
        [(1, "https://a.example.com/x"), (2, "https://b.example.com/y"),
         (3, "http://other.org"), (4, "no-scheme.com/z")],
        "doc_id bigint, url string")
    rows = {r["domain"]: r for r in U.domain_mix(df).collect()}
    assert rows["example.com"]["n_docs"] == 2
    assert rows["other.org"]["n_docs"] == 1
    assert abs(float(rows["example.com"]["share"]) - 2 / 3) < 1e-6
    assert abs(sum(float(r["share"]) for r in rows.values()) - 1.0) < 1e-6


def test_synth_url_fixture_exercises_every_variant(spark):
    """The deterministic doc_id fixture hits all six shells and stays
    distinct per id (hosts repeat, URLs do not)."""
    from flink_descriptive_stats_spark.operators import urls as U
    df = spark.range(12).select(
        F.col("id").alias("doc_id"),
        U.synth_url_expr(F.col("id")).alias("url"))
    comp = U.url_components(df)
    assert comp.count() == 12
    assert df.select("url").distinct().count() == 12
    hosts = {r["host"] for r in comp.where("valid").collect()}
    assert hosts == {"www.example.com", "news.example.org",
                     "example.net", "cdn.static.example.io",
                     "bbc.co.uk"}
    assert comp.where(~F.col("valid")).count() == 2


def test_cli_urls_subcommand(spark, capsys, tmp_path):
    from flink_descriptive_stats_spark.__main__ import main
    src = str(tmp_path / "urls.parquet")
    spark.createDataFrame(
        [(1, "https://www.example.com/a/b"), (2, "http://other.org?q=1"),
         (3, "no-scheme.net/x")],
        "doc_id bigint, url string").write.parquet(src)
    rc = main(["urls", src])
    out = capsys.readouterr().out
    assert rc == 0 and "example.com" in out and "path_depth" in out
    rc = main(["urls", src, "--mix"])
    out = capsys.readouterr().out
    assert rc == 0 and "share" in out and "other.org" in out


def test_cap_domains_semantics(spark):
    """Cap keeps the LOWEST ids per domain, leaves under-cap domains
    whole, keeps malformed rows by default and drops them with
    keep_invalid=False; cap < 1 raises."""
    from flink_descriptive_stats_spark.operators import urls as U
    rows = ([(i, "https://big.example.com/p") for i in range(5)]
            + [(10, "https://small.org/x")]
            + [(11, "malformed-no-scheme/x")])
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = U.cap_domains(df, max_per_domain=2).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    assert sorted(by_dom["example.com"]) == [0, 1]   # lowest ids win
    assert by_dom["small.org"] == [10]               # under cap: whole
    assert by_dom[None] == [11]                      # malformed kept
    strict = U.cap_domains(df, max_per_domain=2, keep_invalid=False)
    assert strict.where(F.col("domain").isNull()).count() == 0
    with pytest.raises(ValueError):
        U.cap_domains(df, max_per_domain=0)


def test_dataset_card_url_section(spark):
    """Card integration pin: the url section's numbers equal bounded
    aggregates of url_components' own per-doc output; the card without
    url_col is byte-identical to before."""
    from flink_descriptive_stats_spark.functions.sig import sig6_py
    from flink_descriptive_stats_spark.operators import quality as Q
    from flink_descriptive_stats_spark.operators import urls as U
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    withurl = docs.select(
        "doc_id", "text", "source",
        U.synth_url_expr(F.col("doc_id")).alias("url"))

    base = Q.dataset_card(withurl).collect()
    assert Q.dataset_card(docs).collect() == base    # unchanged w/o url

    card = Q.dataset_card(withurl, url_col="url").collect()
    assert card[:len(base)] == base
    ur = {r["metric"]: r["value"] for r in card[len(base):]
          if r["section"] == "url"}
    per = U.url_components(withurl).collect()
    n = len(per)
    valid = [r for r in per if r["valid"]]
    doms = [r["domain"] for r in valid if r["domain"] is not None]
    from collections import Counter
    top = Counter(doms).most_common(1)[0][1]
    assert ur["n_url_docs"] == str(n)
    assert ur["invalid_url_fraction"] == sig6_py((n - len(valid)) / n)
    assert ur["n_domains"] == str(len(set(doms)))
    assert ur["max_domain_share"] == sig6_py(top / len(valid))
    assert ur["query_url_fraction"] == sig6_py(
        sum(r["has_query"] for r in valid) / len(valid))
    assert ur["mean_path_depth"] == sig6_py(
        sum(r["path_depth"] for r in valid) / len(valid))


def test_cli_urls_cap_and_flag_conflict(spark, capsys, tmp_path):
    from flink_descriptive_stats_spark.__main__ import main
    src = str(tmp_path / "capurls.parquet")
    spark.createDataFrame(
        [(i, "https://big.example.com/p") for i in range(4)]
        + [(9, "https://small.org/x")],
        "doc_id bigint, url string").write.parquet(src)
    rc = main(["urls", src, "--cap", "2"])
    out = capsys.readouterr().out
    # 2 kept rows, each showing the domain in url AND domain columns
    assert rc == 0 and out.count("example.com") == 4
    assert "small.org" in out
    rc = main(["urls", src, "--mix", "--cap", "2"])
    assert rc == 2


def test_by_source_url_rows_equal_corpus_card_slices(spark):
    """dataset_card_by_source(url_col=): each source's url rows equal
    the corpus card's url section computed on that source's slice
    alone; without url_col the card is byte-identical to before."""
    from flink_descriptive_stats_spark.operators import quality as Q
    from flink_descriptive_stats_spark.operators import urls as U
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    withurl = docs.select(
        "doc_id", "text", "source",
        U.synth_url_expr(F.col("doc_id")).alias("url"))

    base = Q.dataset_card_by_source(withurl).collect()
    assert Q.dataset_card_by_source(docs).collect() == base

    out = Q.dataset_card_by_source(withurl, url_col="url").collect()
    assert out[:len(base)] == base
    extra = out[len(base):]
    assert all(r["metric"].startswith("url_") for r in extra)
    sources = sorted({r["source"] for r in extra})
    for s in sources:
        got = {r["metric"]: r["value"] for r in extra
               if r["source"] == s}
        card = Q.dataset_card(withurl.where(F.col("source") == s),
                              url_col="url").collect()
        want = {"url_" + r["metric"]: r["value"] for r in card
                if r["section"] == "url"}
        assert got == want, s


def test_card_monitor_url_section_equal_batch(spark, tmp_path):
    """The streaming datasheet's url section equals the batch card's
    row-for-row — EVERY url metric is exactly mergeable (sums + the
    bounded domain map), no *_approx names needed. Restart resumes the
    url state losslessly and cross-batch domain counts stay exact even
    when one domain's docs span micro-batches."""
    from flink_descriptive_stats_spark.operators import urls as U
    from flink_descriptive_stats_spark.operators.quality import \
        dataset_card
    from flink_descriptive_stats_spark.streaming.pipeline_stream import \
        start_card_monitor
    df = spark.range(24).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text "), F.col("id")).alias("text"),
        F.lit("sA").alias("source"),
        U.synth_url_expr(F.col("id")).alias("url"))
    chunks = str(tmp_path / "chunks")
    df.repartition(3).write.parquet(chunks)
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(chunks))
        q = start_card_monitor(stream, sink, state_path=state,
                               checkpoint_path=ckpt, url_col="url")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {r["metric"]: r["value"]
                for r in spark.read.parquet(sink).collect()
                if r["section"] == "url"}

    def _want(frame):
        return {r["metric"]: r["value"]
                for r in dataset_card(frame, url_col="url").collect()
                if r["section"] == "url"}

    assert _run() == _want(df)

    # restart with more docs: a heavy burst on ONE domain (bbc.co.uk)
    more = spark.range(6).select(
        (F.col("id") * 6 + 100).alias("doc_id"),  # %6==4 -> bbc.co.uk
        F.lit("late doc").alias("text"),
        F.lit("sB").alias("source"),
        U.synth_url_expr(F.col("id") * 6 + 100).alias("url"))
    more.coalesce(1).write.mode("append").parquet(chunks)
    assert _run() == _want(df.unionByName(more))


def test_decontaminate_by_url_normalization_matrix(spark):
    """Every documented canonical-URL equivalence removes the train
    row; path differences and non-matching malformed rows survive;
    NULL train urls are kept (no key, no match)."""
    from flink_descriptive_stats_spark.operators import urls as U
    train = spark.createDataFrame([
        (0, "https://a.org/page"),          # scheme flip -> removed
        (1, "http://WWW.B.org:8080/x"),     # www+case+port -> removed
        (2, "https://c.org/p?utm=1#f"),     # query+fragment -> removed
        (3, "https://d.org"),               # bare vs '/' -> removed
        (4, "https://a.org/other"),         # different path -> kept
        (5, "raw-no-scheme/z"),             # raw-equal -> removed
        (6, "raw-no-scheme/other"),         # raw-differs -> kept
        (7, None),                          # NULL -> kept
    ], "doc_id bigint, url string")
    holdout = spark.createDataFrame(
        [("http://a.org/page",), ("https://b.org/x",),
         ("https://c.org/p",), ("https://d.org/",),
         ("raw-no-scheme/z",)], "url string")
    kept = sorted(r["doc_id"] for r in
                  U.decontaminate_by_url(train, holdout).collect())
    assert kept == [4, 6, 7]


def test_cli_decontaminate_by_url(spark, capsys, tmp_path):
    from flink_descriptive_stats_spark.__main__ import main
    train = str(tmp_path / "train.parquet")
    hold = str(tmp_path / "hold.parquet")
    spark.createDataFrame(
        [(1, "https://keep.org/a"), (2, "http://WWW.Gone.org:80/x?q=1")],
        "doc_id bigint, url string").write.parquet(train)
    spark.createDataFrame([("https://gone.org/x",)],
                          "url string").write.parquet(hold)
    rc = main(["decontaminate", train, hold, "--by-url"])
    out = capsys.readouterr().out
    assert rc == 0 and "keep.org" in out and "Gone.org" not in out
    rc = main(["decontaminate", train, hold, "--by-url", "--fuzzy"])
    assert rc == 2


def test_curate_corpus_url_stages_equal_manual_composition(spark):
    """url-aware curate_corpus == the manual five-stage composition
    (content decon -> url decon -> quality -> domain cap -> strata
    cap); defaults leave the four-stage pipeline byte-identical."""
    from flink_descriptive_stats_spark.operators import urls as U
    from flink_descriptive_stats_spark.operators.dedup import (
        decontaminate, keep_best_canonical)
    from flink_descriptive_stats_spark.operators.quality import \
        curate_corpus
    from flink_descriptive_stats_spark.operators.sampling import \
        stratified_sample
    from flink_descriptive_stats_spark.operators.text import \
        quality_filter
    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .withColumn("url", U.synth_url_expr(F.col("doc_id"))))
    train = docs.where(F.col("doc_id") % 10 != 0)
    hold = docs.where(F.col("doc_id") % 10 == 0)

    got = sorted(r["doc_id"] for r in
                 curate_corpus(train, hold, url_col="url",
                               max_per_domain=5).collect())
    manual = keep_best_canonical(train)
    manual = decontaminate(manual, hold)
    manual = U.decontaminate_by_url(manual, hold)
    manual = quality_filter(manual)
    manual = U.cap_domains(manual, max_per_domain=5).drop("domain")
    manual = stratified_sample(manual, strata_col="lang", k=10)
    assert got == sorted(r["doc_id"] for r in manual.collect())

    # defaults: byte-identical to the pre-r10 pipeline (url col ignored)
    a = sorted(r["doc_id"] for r in
               curate_corpus(train, hold).collect())
    b = sorted(r["doc_id"] for r in
               curate_corpus(train.drop("url"),
                             hold.drop("url")).collect())
    assert a == b


# ---------------------------------------------------------- r11: suffixes

def test_registrable_domain_suffix_escape_hatch(spark):
    """r11 (VERDICT ask #5): a user-supplied public-suffix set fixes
    the 2-label heuristic for ccTLD hosts — bbc.co.uk reports
    bbc.co.uk with suffixes=["co.uk"]; non-matching hosts and the
    no-suffixes default are byte-identical to before; longer suffixes
    win; a host EQUAL to a suffix falls back to the heuristic."""
    from flink_descriptive_stats_spark.operators import urls as U
    df = spark.createDataFrame(
        [(1, "https://bbc.co.uk/news"),
         (2, "https://www.example.com/a"),
         (3, "https://a.b.co.uk/x"),
         (4, "https://co.uk/"),          # host == suffix: heuristic
         (5, "https://x.ads.co.uk/y")],
        "doc_id bigint, url string")
    base = {r["id"]: r["domain"] for r in U.url_components(df).collect()}
    assert base[1] == "co.uk" and base[2] == "example.com"
    got = {r["id"]: r["domain"]
           for r in U.url_components(df, suffixes=["co.uk"]).collect()}
    assert got[1] == "bbc.co.uk"
    assert got[2] == "example.com"       # unaffected host unchanged
    assert got[3] == "b.co.uk"           # one label above the suffix
    assert got[4] == "co.uk"             # no registrable label
    # longer suffix wins over its own suffix
    deep = {r["id"]: r["domain"]
            for r in U.url_components(
                df, suffixes=["co.uk", "ads.co.uk"]).collect()}
    assert deep[5] == "x.ads.co.uk" and deep[1] == "bbc.co.uk"


def test_suffixes_thread_through_mix_cap_block(spark):
    """domain_mix keys, cap_domains caps, and block_domains blocks on
    the suffix-aware domain when the list is passed."""
    from flink_descriptive_stats_spark.operators import urls as U
    rows = ([(i, f"https://site{i % 2}.co.uk/p") for i in range(6)]
            + [(10, "https://plain.org/x")])
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    sfx = ["co.uk"]
    mix = {r["domain"]: r["n_docs"]
           for r in U.domain_mix(df, suffixes=sfx).collect()}
    assert mix == {"site0.co.uk": 3, "site1.co.uk": 3, "plain.org": 1}
    # without the list every .co.uk host collapses into one domain
    assert U.domain_mix(df).count() == 2
    capped = U.cap_domains(df, max_per_domain=2, suffixes=sfx)
    per = {r["domain"]: 0 for r in capped.collect()}
    for r in capped.collect():
        per[r["domain"]] += 1
    assert per == {"site0.co.uk": 2, "site1.co.uk": 2, "plain.org": 1}
    blocked = U.block_domains(df, ["site0.co.uk"], suffixes=sfx)
    assert {r["doc_id"] for r in blocked.collect()} == {1, 3, 5, 10}
