"""CLI entry point — the Spark-first analogue of the reference job's
``main()`` (ProfileJob.java:78-143: ParameterTool.fromArgs -> dataflow ->
console report), extended with subcommands for the pipeline operators so
the engine is usable as a tool, not only a library:

    python -m flink_descriptive_stats_spark [profile] INPUT [options]
    python -m flink_descriptive_stats_spark dedup INPUT --method minhash
    python -m flink_descriptive_stats_spark decontaminate TRAIN HOLDOUT
    python -m flink_descriptive_stats_spark text-stats INPUT
    python -m flink_descriptive_stats_spark ann INPUT --method ivf-kmeans

INPUT is a parquet/csv/json file or directory. ``profile`` prints the
S4-style console report; the pipeline subcommands write parquet when
``--output`` is given, else print a 20-row preview.
"""

from __future__ import annotations

import argparse
import sys

SUBCOMMANDS = ("profile", "dedup", "decontaminate", "text-stats",
               "quality-filter", "ann", "pii-scan", "pii-redact",
               "entropy", "refint", "fk", "fk-discover", "delta", "clean",
               "benford", "tfidf", "compare",
               "funnel", "retention", "resample", "robust-outliers", "fd",
               "check", "acf", "transitions", "rollup", "typos",
               "semdedup", "trend", "lm-score", "lang-confusion",
               "lang-segments",
               "histogram2d", "doc-clusters", "cluster-sample",
               "session-summary", "spearman", "woe", "null-patterns",
               "paths", "monitor-profile", "monitor-drift",
               "monitor-card", "explain",
               "list-queries", "compression", "label-separation",
               "join-advisor", "paragraph-dedup", "label-purity",
               "dup-rate", "source-overlap", "temporal-split", "pack-bfd",
               "k-anonymity",
               "quality-ensemble", "curate", "keys", "fuzzy-join",
               "temperature-mix", "dataset-card", "covariance",
               "media-neardup", "extract", "urls", "remove-spans",
               "dedup-lines")


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--format", default=None,
                   help="input format (default: inferred from extension; "
                        "'textdir' = one-file-per-document text corpus, "
                        "'binarydir' = directory of binary assets)")
    p.add_argument("--master", default=None,
                   help="Spark master (default: local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--output", default=None,
                   help="write result parquet here instead of previewing")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m flink_descriptive_stats_spark",
        description="Distributed profiling + training-data pipeline ops.")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("profile",
                        help="single-pass profile + top-K console report")
    pr.add_argument("input", help="parquet/csv/json path")
    pr.add_argument("--columns", default=None,
                    help="comma-separated subset of columns to profile")
    pr.add_argument("--no-topk", action="store_true",
                    help="skip the top-K values/patterns pass")
    _add_common(pr)

    dd = sub.add_parser("dedup", help="dedup the corpus")
    dd.add_argument("input")
    dd.add_argument("--method", default="exact",
                    choices=["exact", "keep-first", "minhash-pairs",
                             "simhash-pairs", "corpus", "jaccard-pairs",
                             "containment-pairs", "dup-fraction",
                             "canonical", "keep-best", "jaccard-prefix",
                             "corpus-keep-best"])
    dd.add_argument("--threshold", type=float, default=0.5)
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    _add_common(dd)

    dc = sub.add_parser("decontaminate",
                        help="remove holdout contamination from train")
    dc.add_argument("train")
    dc.add_argument("holdout")
    dc.add_argument("--fuzzy", action="store_true",
                    help="LSH band matching instead of exact hashes")
    dc.add_argument("--bloom", action="store_true",
                    help="Bloom-prefiltered exact path: same output, the "
                         "corpus-side shuffle shrinks to the bloom-"
                         "positive sliver (the 100 TB middle regime)")
    dc.add_argument("--spans", action="store_true",
                    help="SURGICAL: rewrite out only the train spans "
                         "whose word n-grams appear in the holdout "
                         "(docs survive minus the quoted text) "
                         "instead of dropping whole docs")
    dc.add_argument("--span-ngram", type=int, default=5,
                    help="with --spans: the word n-gram width")
    dc.add_argument("--by-url", action="store_true",
                    help="match on canonical URLs (scheme/case/port/"
                         "www/query-insensitive) instead of content — "
                         "catches eval docs whose published page the "
                         "train text doesn't reproduce verbatim")
    dc.add_argument("--url-col", default="url")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--id-col", default="doc_id")
    _add_common(dc)

    ts = sub.add_parser("text-stats", help="per-doc text statistics")
    ts.add_argument("input")
    ts.add_argument("--text-col", default="text")
    ts.add_argument("--id-col", default="doc_id")
    _add_common(ts)

    qf = sub.add_parser("quality-filter",
                        help="keep docs above the quality threshold")
    qf.add_argument("input")
    qf.add_argument("--text-col", default="text")
    qf.add_argument("--id-col", default="doc_id")
    _add_common(qf)

    for name, hlp in (("pii-scan", "per-doc PII hit counts"),
                      ("pii-redact", "typed-placeholder PII redaction")):
        pp = sub.add_parser(name, help=hlp)
        pp.add_argument("input")
        pp.add_argument("--text-col", default="text")
        pp.add_argument("--id-col", default="doc_id")
        _add_common(pp)

    an = sub.add_parser("ann", help="cosine top-k over an embedding column")
    an.add_argument("input")
    an.add_argument("--method", default="brute",
                    choices=["brute", "lsh", "lsh-multiprobe", "ivf",
                             "ivf-kmeans", "pq", "ivf-pq",
                             "pq-calibration", "pq-index",
                             "ivf-pq-index", "index-stats",
                             "index-calibration",
                             "compact-index", "rebuild-index",
                             "index-recall", "index-refine"])
    an.add_argument("--k", type=int, default=5)
    an.add_argument("--vec-col", default="embedding")
    an.add_argument("--id-col", default="vec_id")
    an.add_argument("--index-path", default=None,
                    help="pq-index: where the code table + codebook "
                         "sidecar live (built if absent)")
    an.add_argument("--n-cells", type=int, default=None,
                    help="rebuild-index: override the sidecar's IVF "
                         "cell count (the growth remediation — e.g. 2x "
                         "cells after the corpus outgrew the build)")
    an.add_argument("--m", type=int, default=None,
                    help="rebuild-index: override the sidecar's PQ "
                         "subquantizer count")
    an.add_argument("--ksub", type=int, default=None,
                    help="rebuild-index: override the sidecar's "
                         "per-subquantizer codebook size")
    an.add_argument("--n-probes", default="1,2,4,8",
                    help="index-recall: comma-separated n_probe grid "
                         "for the recall@k sweep")
    an.add_argument("--refines", default="1,2,4,8",
                    help="index-refine: comma-separated refine grid "
                         "(ADC shortlist = refine*k) for the flat-PQ "
                         "recall@k sweep")
    _add_common(an)

    mn = sub.add_parser("media-neardup",
                        help="near-duplicate image/audio pairs via "
                             "perceptual hashing (DCT pHash / "
                             "Haitsma-Kalker fingerprint)")
    mn.add_argument("input", help="parquet with (id, payload binary)")
    mn.add_argument("--kind", default="image",
                    choices=["image", "audio", "auto"],
                    help="'auto' (with --dedup): sniff each payload's "
                         "container and dedup a MIXED image+audio "
                         "column in one fingerprint pass")
    mn.add_argument("--dedup", action="store_true",
                    help="emit the near-dup-DEDUPLICATED keep set "
                         "(one representative per perceptual cluster; "
                         "media_dedup_corpus) instead of the pair list")
    mn.add_argument("--max-hamming", type=int, default=None,
                    help="bit threshold (default 6 image / 8 audio). "
                         "NOTE: the banded funnel guarantees recall "
                         "only up to n_bands-1 bits (3 at the default "
                         "4 bands); pairs above that are heuristically "
                         "recalled — measure with hamming_calibration "
                         "or raise n_bands to max_hamming+1 for "
                         "guaranteed completeness")
    mn.add_argument("--id-col", default="id")
    mn.add_argument("--payload-col", default="payload")
    mn.add_argument("--n-bands", default="4",
                    help="funnel bands (must divide 64); 'auto' picks "
                         "the guaranteed-recall geometry "
                         "(max_hamming+1 rounded up to a 64-divisor — "
                         "mind the 2^(64/n_bands) bucket-key space)")
    mn.add_argument("--calibrate", action="store_true",
                    help="instead of pairs, report measured funnel "
                         "recall vs exhaustive ground truth per Hamming "
                         "distance on a bounded sample "
                         "(hamming_calibration)")
    _add_common(mn)

    cr = sub.add_parser("compression",
                        help="per-doc zlib compression-ratio quality screen")
    cr.add_argument("input")
    cr.add_argument("--text-col", default="text")
    cr.add_argument("--id-col", default="doc_id")
    _add_common(cr)

    ex = sub.add_parser("extract",
                        help="markup text extraction (crawl stage 0): "
                             "strip script/style/nav/comments/tags, "
                             "decode entities, collapse whitespace")
    ex.add_argument("input")
    ex.add_argument("--html-col", default="html")
    ex.add_argument("--id-col", default="doc_id")
    ex.add_argument("--density", action="store_true",
                    help="emit per-doc markup-density signals instead "
                         "of the extracted text")
    _add_common(ex)

    ur = sub.add_parser("urls",
                        help="crawl-metadata URL parsing: per-doc "
                             "scheme/host/domain/tld/path-depth/query "
                             "components, or the per-domain dominance "
                             "mix (--mix)")
    ur.add_argument("input")
    ur.add_argument("--url-col", default="url")
    ur.add_argument("--id-col", default="doc_id")
    ur.add_argument("--mix", action="store_true",
                    help="emit (domain, n_docs, share) over valid URLs "
                         "instead of per-doc components")
    ur.add_argument("--cap", type=int, default=None, metavar="N",
                    help="apply the per-domain cap instead: keep at "
                         "most N docs per domain (lowest id first; "
                         "malformed rows kept)")
    ur.add_argument("--block", default=None, metavar="D1,D2",
                    help="apply the domain blocklist instead: drop "
                         "rows under these comma-separated registrable "
                         "domains (subdomains included; malformed rows "
                         "kept)")
    ur.add_argument("--suffixes", default=None, metavar="S1,S2",
                    help="optional public-suffix list (e.g. co.uk) "
                         "folded into the registrable-domain "
                         "expression for every mode — bbc.co.uk "
                         "reports bbc.co.uk instead of co.uk")
    _add_common(ur)

    ls = sub.add_parser("label-separation",
                        help="per-label Fisher separability over embeddings")
    ls.add_argument("input")
    ls.add_argument("--vec-col", default="embedding")
    ls.add_argument("--id-col", default="vec_id")
    ls.add_argument("--label-col", default="label")
    _add_common(ls)

    ja = sub.add_parser("join-advisor",
                        help="pre-join cardinality audit + strategy pick")
    ja.add_argument("left")
    ja.add_argument("right")
    ja.add_argument("--key", required=True,
                    help="join key (KEY or KEY_LEFT,KEY_RIGHT)")
    _add_common(ja)

    pd_ = sub.add_parser("paragraph-dedup",
                         help="duplicated 64-token passages across docs")
    pd_.add_argument("input")
    pd_.add_argument("--window-tokens", type=int, default=64)
    pd_.add_argument("--text-col", default="text")
    pd_.add_argument("--id-col", default="doc_id")
    _add_common(pd_)

    lp = sub.add_parser("label-purity",
                        help="per-cell label purity over embeddings")
    lp.add_argument("input")
    lp.add_argument("--n-cells", type=int, default=16)
    lp.add_argument("--vec-col", default="embedding")
    lp.add_argument("--id-col", default="vec_id")
    lp.add_argument("--label-col", default="label")
    _add_common(lp)

    so = sub.add_parser("source-overlap",
                        help="pairwise cross-source duplication matrix "
                             "(which feeds mirror each other)")
    so.add_argument("input")
    so.add_argument("--text-col", default="text")
    so.add_argument("--source-col", default="source")
    so.add_argument("--canonical", action="store_true",
                    help="key on the formatting-insensitive canonical "
                         "form instead of raw bytes")
    so.add_argument("--fuzzy", action="store_true",
                    help="MinHash near-dup pairs across sources "
                         "instead of exact shared hashes")
    so.add_argument("--threshold", type=float, default=0.5,
                    help="with --fuzzy: verified-Jaccard cutoff")
    _add_common(so)

    dr = sub.add_parser("dup-rate",
                        help="per-source exact/canonical duplication rates")
    dr.add_argument("input")
    dr.add_argument("--text-col", default="text")
    dr.add_argument("--source-col", default="source")
    _add_common(dr)

    tsp = sub.add_parser("temporal-split",
                         help="chronological train/holdout split")
    tsp.add_argument("input")
    tsp.add_argument("--ts-col", default="ts")
    tsp.add_argument("--holdout-frac", type=float, default=0.1)
    _add_common(tsp)

    pb = sub.add_parser("pack-bfd",
                        help="best-fit-decreasing sequence packing")
    pb.add_argument("input")
    pb.add_argument("--max-tokens", type=int, default=512)
    pb.add_argument("--n-shards", type=int, default=8)
    pb.add_argument("--text-col", default="text")
    pb.add_argument("--id-col", default="doc_id")
    pb.add_argument("--stats", action="store_true",
                    help="one-row packing summary (n_packs, fills, "
                         "overflow) instead of the per-doc assignment")
    pb.add_argument("--n-tokens-col", default=None,
                    help="budget by this precomputed per-doc token-count "
                         "column (tokenizer-true packing, e.g. the "
                         "n_bpe_tokens a bpe-stats run wrote) instead "
                         "of whitespace tokens of --text-col")
    _add_common(pb)

    ka = sub.add_parser("k-anonymity",
                        help="k-anonymity audit over quasi-identifiers")
    ka.add_argument("input")
    ka.add_argument("--cols", required=True,
                    help="comma-separated quasi-identifier columns")
    ka.add_argument("--k", type=int, default=5)
    _add_common(ka)

    qe = sub.add_parser("quality-ensemble",
                        help="rank-fusion curation score per document")
    qe.add_argument("input")
    qe.add_argument("--text-col", default="text")
    qe.add_argument("--id-col", default="doc_id")
    _add_common(qe)

    cu = sub.add_parser("curate",
                        help="full curation pipeline: keep-best dedup -> "
                             "decontaminate (content, and by URL with "
                             "--url-col) -> quality filter -> optional "
                             "per-domain cap -> per-stratum cap")
    cu.add_argument("train")
    cu.add_argument("holdout")
    cu.add_argument("--min-score", type=float, default=0.5)
    cu.add_argument("--strata-col", default="lang")
    cu.add_argument("--cap", type=int, default=10)
    cu.add_argument("--url-col", default=None,
                    help="when set, also decontaminate by canonical "
                         "URL (if the holdout carries the column)")
    cu.add_argument("--max-per-domain", type=int, default=None,
                    help="with --url-col: cap docs per registrable "
                         "domain before the strata cap")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--clean", action="store_true",
                    help="repair invisible unicode damage FIRST so "
                         "dedup/decontamination/quality see clean text")
    cu.add_argument("--despan-min-df", type=int, default=None,
                    metavar="DF",
                    help="strip cross-document repeated spans (df >= "
                         "DF boilerplate) after decontamination, "
                         "before the quality filter")
    cu.add_argument("--dedup-lines", action="store_true",
                    help="within-page repeated-line removal on both "
                         "sides before dedup/decontamination")
    _add_common(cu)

    ky = sub.add_parser("keys",
                        help="single-column primary-key candidates")
    ky.add_argument("input")
    ky.add_argument("--columns", default=None)
    _add_common(ky)

    dca = sub.add_parser("dataset-card",
                         help="one-call corpus datasheet (size, dedup, "
                              "quality, language, PII)")
    dca.add_argument("input")
    dca.add_argument("--text-col", default="text")
    dca.add_argument("--id-col", default="doc_id")
    dca.add_argument("--source-col", default="source")
    dca.add_argument("--by-source", action="store_true",
                     help="per-source triage view instead of the "
                          "corpus-level card")
    dca.add_argument("--approx", action="store_true",
                     help="the 100 TB path: GK-sketch median_tokens "
                          "and HLL duplicate fractions (no Expand, no "
                          "exact-distinct shuffle over doc hashes) "
                          "instead of the exact percentile/distincts")
    dca.add_argument("--payload-col", default=None,
                     help="binary media column: append the media "
                          "section (n_payloads, decodable fraction, "
                          "near-dup cluster mass)")
    dca.add_argument("--media-kind", default="image",
                     choices=["image", "audio", "auto"],
                     help="'auto' sniffs each payload's container and "
                          "emits per-modality media sections")
    dca.add_argument("--cleaning", action="store_true",
                     help="append the cleaning section (invisible-"
                          "damage fractions and per-class char totals)")
    dca.add_argument("--card-url-col", default=None, metavar="COL",
                     help="crawl-metadata URL column: append the url "
                          "section (domain dominance, malformed/query "
                          "fractions, path depth)")
    dca.add_argument("--url-suffixes", default=None, metavar="S1,S2",
                     help="optional public-suffix list for the url "
                          "section's registrable-domain keying")
    dca.add_argument("--boilerplate-phrase", action="append",
                     default=None, metavar="P",
                     help="append the boilerplate section: per-phrase "
                          "doc counts + any-phrase fraction "
                          "(repeatable; frozen list, sum-monoids — "
                          "also available on monitor-card)")
    dca.add_argument("--five-pass", action="store_true",
                     help="the audit-trail path: one scan per signal "
                          "aggregate (the component operators' own "
                          "numbers, literally) instead of the default "
                          "single-pass plan")
    _add_common(dca)

    tmx = sub.add_parser("temperature-mix",
                         help="n^alpha temperature mixture sampling "
                              "across sources")
    tmx.add_argument("input")
    tmx.add_argument("--alpha", type=float, default=0.5)
    tmx.add_argument("--target-fraction", type=float, default=0.5)
    tmx.add_argument("--source-col", default="source")
    tmx.add_argument("--id-col", default="doc_id")
    tmx.add_argument("--weight-col", default=None,
                     help="weight sources by this per-doc mass column "
                          "(token counts) instead of doc counts — the "
                          "token-mass n^alpha law")
    _add_common(tmx)

    fj = sub.add_parser("fuzzy-join",
                        help="record linkage on approximately-equal keys")
    fj.add_argument("left")
    fj.add_argument("right")
    fj.add_argument("--key", required=True,
                    help="key column (KEY or KEY_LEFT,KEY_RIGHT)")
    fj.add_argument("--max-dist", type=int, default=1)
    _add_common(fj)

    en = sub.add_parser("entropy",
                        help="per-column value-distribution entropy")
    en.add_argument("input")
    en.add_argument("--columns", default=None)
    _add_common(en)

    fk = sub.add_parser("fk",
                        help="inclusion-dependency audit between two "
                             "tables (or --orphans: the violating rows)")
    fk.add_argument("child")
    fk.add_argument("parent")
    fk.add_argument("--child-col", required=True,
                    help="child key column; comma-separate for a "
                         "composite key (a,b)")
    fk.add_argument("--parent-col", required=True,
                    help="parent key column; comma-separate for a "
                         "composite key (same width as --child-col)")
    fk.add_argument("--orphans", action="store_true",
                    help="emit the orphan child ROWS instead of the "
                         "one-row containment audit")
    fk.add_argument("--repair", choices=["drop", "nullify"],
                    default=None,
                    help="emit the REPAIRED child instead: drop "
                         "orphan rows, or NULL their dangling keys")
    _add_common(fk)

    fkd = sub.add_parser("fk-discover",
                         help="undeclared FK discovery across tables "
                              "(exact key/range pruning + containment)")
    fkd.add_argument("inputs", nargs="+",
                     help="table paths; the table name is the file stem")
    fkd.add_argument("--min-containment", type=float, default=1.0)
    fkd.add_argument("--max-key-width", type=int, default=1,
                     choices=(1, 2),
                     help="2: also discover composite 2-column keys "
                          "(name-affinity-bounded pair space)")
    _add_common(fkd)

    dl = sub.add_parser("delta",
                        help="doc-level snapshot diff: added/removed/"
                             "changed/unchanged between two runs")
    dl.add_argument("old")
    dl.add_argument("new")
    dl.add_argument("--id-col", default="doc_id")
    dl.add_argument("--content-cols", default="text",
                    help="comma-separated content-identity columns")
    dl.add_argument("--summary", action="store_true",
                    help="4-row status rollup instead of per-doc rows")
    dl.add_argument("--by-source", metavar="COL", default=None,
                    help="(source, status, n) rollup keyed on COL")
    dl.add_argument("--schema", action="store_true",
                    help="column-level diff (added/removed/type-"
                         "changed) instead of the row-level one")
    _add_common(dl)

    cl = sub.add_parser("clean",
                        help="unicode text repair: strip controls/"
                             "zero-widths, canonicalize spaces")
    cl.add_argument("input")
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--report", action="store_true",
                    help="per-doc damage counts instead of cleaned text")
    cl.add_argument("--nfc", action="store_true",
                    help="NFC canonical composition instead of the "
                         "regex repairs")
    _add_common(cl)

    rs = sub.add_parser("remove-spans",
                        help="strip cross-document repeated spans "
                             "(boilerplate headers/footers) — the "
                             "exact-substring dedup stage after "
                             "doc-level dedup")
    rs.add_argument("input")
    rs.add_argument("--text-col", default="text")
    rs.add_argument("--id-col", default="doc_id")
    rs.add_argument("--min-ngram", type=int, default=5,
                    help="span granularity: word n-gram length")
    rs.add_argument("--max-ngram", type=int, default=None,
                    help="mine every length in [min-ngram, max-ngram] "
                         "in one pass (length folded into the hash); "
                         "default: single-length mining")
    rs.add_argument("--min-df", type=int, default=5,
                    help="an n-gram is boilerplate when >= this many "
                         "DISTINCT docs contain it")
    rs.add_argument("--report-top", type=int, default=None,
                    metavar="K",
                    help="emit the top-K repeated n-grams AS STRINGS "
                         "(the triage view) instead of rewriting")
    rs.add_argument("--phrase", action="append", default=None,
                    metavar="P",
                    help="apply a FROZEN boilerplate phrase instead of "
                         "mining (repeatable; map-only, streams): the "
                         "mine-on-sample-then-apply-everywhere recipe")
    _add_common(rs)

    dl = sub.add_parser("dedup-lines",
                        help="remove repeated lines WITHIN each "
                             "document (scraper-duplicated nav/footer "
                             "lines; blank lines kept) — map-only, "
                             "runs before any cross-document dedup")
    dl.add_argument("input")
    dl.add_argument("--text-col", default="text")
    dl.add_argument("--id-col", default="doc_id")
    dl.add_argument("--max-lines", type=int, default=None,
                    help="degenerate-page guard: docs with more lines "
                         "pass through untouched (default: the "
                         "operator's 100000); 0 disables the guard")
    _add_common(dl)

    ri = sub.add_parser("refint",
                        help="FK orphan check between fact and dim")
    ri.add_argument("fact")
    ri.add_argument("dim")
    ri.add_argument("--fk", required=True)
    ri.add_argument("--pk", required=True)
    _add_common(ri)

    bf = sub.add_parser("benford",
                        help="leading-digit distribution vs Benford")
    bf.add_argument("input")
    bf.add_argument("--column", required=True)
    _add_common(bf)

    tf = sub.add_parser("tfidf", help="per-doc top-k terms by tf-idf")
    tf.add_argument("input")
    tf.add_argument("--k", type=int, default=5)
    tf.add_argument("--text-col", default="text")
    tf.add_argument("--id-col", default="doc_id")
    _add_common(tf)

    cp = sub.add_parser("compare",
                        help="snapshot drift report between two tables")
    cp.add_argument("input_a")
    cp.add_argument("input_b")
    cp.add_argument("--columns", default=None)
    cp.add_argument("--ks-column", default=None,
                    help="also print the exact KS statistic for this column")
    cp.add_argument("--ks-approx", action="store_true",
                    help="sketch-grid KS instead of the exact global "
                         "sort (the 100 TB path)")
    _add_common(cp)

    fu = sub.add_parser("funnel", help="strictly-ordered event funnel")
    fu.add_argument("input")
    fu.add_argument("--steps", default="view,click,purchase")
    fu.add_argument("--key-col", default="user_id")
    fu.add_argument("--type-col", default="event_type")
    fu.add_argument("--ts-col", default="ts")
    _add_common(fu)

    re_ = sub.add_parser("retention", help="weekly retention cohorts")
    re_.add_argument("input")
    re_.add_argument("--key-col", default="user_id")
    re_.add_argument("--ts-col", default="ts")
    re_.add_argument("--max-offset", type=int, default=None)
    _add_common(re_)

    rs = sub.add_parser("resample",
                        help="fixed-interval downsample with LOCF gap fill")
    rs.add_argument("input")
    rs.add_argument("--every-minutes", type=int, default=60)
    rs.add_argument("--ts-col", default="ts")
    rs.add_argument("--value-col", default="value")
    rs.add_argument("--fill", default="locf", choices=["locf", "null"])
    _add_common(rs)

    ro = sub.add_parser("robust-outliers",
                        help="median/MAD modified z-score outlier counts")
    ro.add_argument("input")
    ro.add_argument("--columns", default=None)
    ro.add_argument("--threshold", type=float, default=3.5)
    _add_common(ro)

    fd = sub.add_parser("fd",
                        help="functional-dependency check for column pairs")
    fd.add_argument("input")
    fd.add_argument("--pairs", required=True,
                    help="comma-separated a->b pairs, e.g. 'zip->city,id->name'")
    _add_common(fd)

    ck = sub.add_parser("check",
                        help="declarative constraint suite (one agg pass)")
    ck.add_argument("input")
    ck.add_argument("--rules", required=True,
                    help="';'-separated rules: not_null:col | unique:col | "
                         "in_range:col:lo:hi | matches:col:regex | "
                         "in_set:col:v1|v2")
    ck.add_argument("--by", default=None,
                    help="evaluate the suite per value of this column")
    _add_common(ck)

    ac = sub.add_parser("acf", help="per-series autocorrelation function")
    ac.add_argument("input")
    ac.add_argument("--key-col", default="event_type")
    ac.add_argument("--ts-col", default="ts")
    ac.add_argument("--id-col", default="event_id")
    ac.add_argument("--value-col", default="value")
    ac.add_argument("--max-lag", type=int, default=5)
    _add_common(ac)

    tm = sub.add_parser("transitions",
                        help="first-order Markov event-type transitions")
    tm.add_argument("input")
    tm.add_argument("--key-col", default="user_id")
    tm.add_argument("--type-col", default="event_type")
    tm.add_argument("--ts-col", default="ts")
    tm.add_argument("--id-col", default="event_id")
    _add_common(tm)

    rl = sub.add_parser("rollup",
                        help="ROLLUP(key, day) multi-granularity profile")
    rl.add_argument("input")
    rl.add_argument("--key-col", default="event_type")
    rl.add_argument("--ts-col", default="ts")
    rl.add_argument("--value-col", default="value")
    _add_common(rl)

    ty = sub.add_parser("typos",
                        help="SymSpell edit-distance<=d vocabulary pairs")
    ty.add_argument("input")
    ty.add_argument("--text-col", default="text")
    ty.add_argument("--max-dist", type=int, default=2)
    ty.add_argument("--min-count", type=int, default=1)
    _add_common(ty)

    sd = sub.add_parser("semdedup",
                        help="semantic dedup over an embedding column")
    sd.add_argument("input")
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--n-cells", type=int, default=16)
    sd.add_argument("--refine-iters", type=int, default=0)
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--id-col", default="vec_id")
    _add_common(sd)

    tr = sub.add_parser("trend", help="per-series least-squares trend")
    tr.add_argument("input")
    tr.add_argument("--key-col", default="event_type")
    tr.add_argument("--ts-col", default="ts")
    tr.add_argument("--value-col", default="value")
    _add_common(tr)

    lm = sub.add_parser("lm-score",
                        help="per-doc bigram LM cross-entropy score")
    lm.add_argument("input")
    lm.add_argument("--text-col", default="text")
    lm.add_argument("--id-col", default="doc_id")
    _add_common(lm)

    lsg = sub.add_parser("lang-segments",
                         help="per-doc mixed-language report from "
                              "disjoint chunk-level language votes")
    lsg.add_argument("input")
    lsg.add_argument("--text-col", default="text")
    lsg.add_argument("--id-col", default="doc_id")
    lsg.add_argument("--max-tokens", type=int, default=64)
    _add_common(lsg)

    lc = sub.add_parser("lang-confusion",
                        help="declared vs predicted language matrix")
    lc.add_argument("input")
    lc.add_argument("--text-col", default="text")
    lc.add_argument("--lang-col", default="lang")
    _add_common(lc)

    h2 = sub.add_parser("histogram2d", help="joint 2-D density histogram")
    h2.add_argument("input")
    h2.add_argument("--x", required=True)
    h2.add_argument("--y", required=True)
    h2.add_argument("--bins", type=int, default=10)
    _add_common(h2)

    dc = sub.add_parser("doc-clusters",
                        help="hashed-TF corpus clustering")
    dc.add_argument("input")
    dc.add_argument("--k", type=int, default=8)
    dc.add_argument("--dim", type=int, default=64)
    dc.add_argument("--refine-iters", type=int, default=0)
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--id-col", default="doc_id")
    _add_common(dc)

    cs = sub.add_parser("cluster-sample",
                        help="topic-balanced exact-k per-cluster sample")
    cs.add_argument("input")
    cs.add_argument("--k-per-cluster", type=int, default=5)
    cs.add_argument("--n-clusters", type=int, default=8)
    cs.add_argument("--text-col", default="text")
    cs.add_argument("--id-col", default="doc_id")
    _add_common(cs)

    ss = sub.add_parser("session-summary",
                        help="corpus-level session engagement rollup")
    ss.add_argument("input")
    ss.add_argument("--key-col", default="user_id")
    ss.add_argument("--ts-col", default="ts")
    ss.add_argument("--gap", default="30 minutes")
    _add_common(ss)

    sp = sub.add_parser("spearman", help="rank correlation matrix")
    sp.add_argument("input")
    sp.add_argument("--columns", default=None,
                    help="comma-separated numeric columns")
    sp.add_argument("--approx", action="store_true",
                    help="bucket-index ranks (no global sort — the "
                         "100 TB path)")
    sp.add_argument("--buckets", type=int, default=200)
    _add_common(sp)

    cv = sub.add_parser("covariance",
                        help="all-pairs sample covariance matrix")
    cv.add_argument("input")
    cv.add_argument("--columns", default=None,
                    help="comma-separated numeric columns")
    cv.add_argument("--gram", action="store_true",
                    help="force the centered-Gram Arrow path (auto-picked "
                         "for wide schemas)")
    _add_common(cv)

    wv = sub.add_parser("woe",
                        help="WOE / information value per feature bin")
    wv.add_argument("input")
    wv.add_argument("--feature", required=True)
    wv.add_argument("--label", required=True,
                    help="0/1 column or SQL expression")
    wv.add_argument("--bins", type=int, default=10)
    _add_common(wv)

    np_ = sub.add_parser("null-patterns",
                         help="null-combination pattern report")
    np_.add_argument("input")
    np_.add_argument("--columns", default=None)
    _add_common(np_)

    pa = sub.add_parser("paths", help="top-k event-type paths per user")
    pa.add_argument("input")
    pa.add_argument("--depth", type=int, default=3)
    pa.add_argument("--k", type=int, default=20)
    pa.add_argument("--key-col", default="user_id")
    pa.add_argument("--type-col", default="event_type")
    pa.add_argument("--ts-col", default="ts")
    pa.add_argument("--id-col", default="event_id")
    _add_common(pa)

    mp = sub.add_parser(
        "monitor-profile",
        help="incremental corpus profile over a growing directory: "
             "processes all available files then exits; repeated "
             "invocations resume from --state/--checkpoint")
    mp.add_argument("input", help="parquet DIRECTORY (streaming source)")
    mp.add_argument("--columns", required=True)
    mp.add_argument("--sink", required=True)
    mp.add_argument("--state", default=None)
    mp.add_argument("--checkpoint", default=None)
    mp.add_argument("--master", default=None)
    mp.add_argument("--format", default=None)

    mc = sub.add_parser(
        "monitor-card",
        help="running dataset card over a growing document directory: "
             "counts/quality/langs/PII fold exactly, median_tokens "
             "stays EXACT (token-count histogram state), duplicate "
             "fractions ride mergeable HLL sketches (*_approx rows)")
    mc.add_argument("input", help="parquet DIRECTORY (streaming source)")
    mc.add_argument("--sink", required=True)
    mc.add_argument("--state", default=None)
    mc.add_argument("--checkpoint", default=None)
    mc.add_argument("--text-col", default="text")
    mc.add_argument("--id-col", default="doc_id")
    mc.add_argument("--source-col", default="source")
    mc.add_argument("--boilerplate-phrase", action="append",
                    default=None, metavar="P",
                    help="fold the boilerplate section (per-phrase "
                         "doc counts, any-phrase fraction — pure "
                         "sums, streams exactly)")
    mc.add_argument("--master", default=None)
    mc.add_argument("--format", default=None)

    md = sub.add_parser(
        "monitor-drift",
        help="incremental PSI/JSD of a growing directory against a "
             "fixed reference parquet")
    md.add_argument("input", help="parquet DIRECTORY (streaming source)")
    md.add_argument("--reference", required=True)
    md.add_argument("--column", required=True)
    md.add_argument("--bins", type=int, default=10)
    md.add_argument("--sink", required=True)
    md.add_argument("--state", default=None)
    md.add_argument("--checkpoint", default=None)
    md.add_argument("--master", default=None)
    md.add_argument("--format", default=None)

    ex = sub.add_parser(
        "explain",
        help="print the formatted physical plan of a named engine query "
             "(plan introspection — see EXPLAIN.md for the annotated set)")
    ex.add_argument("query", help="a queries() name; see list-queries")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument("--master", default=None)

    lq = sub.add_parser("list-queries",
                        help="list every named engine query (the driver-"
                             "gated surface)")
    lq.add_argument("--master", default=None)
    return p


def parse_rules(spec: str) -> list[tuple]:
    """'not_null:c;in_range:c:0:1;in_set:c:A|B' -> quality rule tuples."""
    rules: list[tuple] = []
    for part in spec.split(";"):
        bits = part.split(":")
        kind = bits[0]
        if kind in ("not_null", "unique"):
            rules.append((kind, bits[1]))
        elif kind == "in_range":
            rules.append((kind, bits[1], float(bits[2]), float(bits[3])))
        elif kind == "matches":
            rules.append((kind, bits[1], ":".join(bits[2:])))
        elif kind == "in_set":
            rules.append((kind, bits[1], tuple(bits[2].split("|"))))
        else:
            raise SystemExit(f"unknown rule kind: {kind}")
    return rules


def infer_format(path: str) -> str:
    for ext in ("parquet", "csv", "json"):
        if path.rstrip("/").endswith("." + ext):
            return ext
    return "parquet"


def _load(spark, path: str, fmt: str | None):
    fmt = fmt or infer_format(path)
    if fmt == "textdir":
        # directory of one-file-per-document text: documents shape
        from flink_descriptive_stats_spark.sources.tables import \
            load_text_dir
        return load_text_dir(spark, path)
    if fmt == "binarydir":
        # directory of binary assets: multimodal payload shape
        from flink_descriptive_stats_spark.sources.tables import \
            load_binary_dir
        return load_binary_dir(spark, path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(path)


def _emit(df, output: str | None) -> None:
    if output:
        df.write.mode("overwrite").parquet(output)
        print(f"wrote {output}")
    else:
        df.show(20, truncate=60)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # back-compat: a bare INPUT path (no subcommand) means `profile INPUT`
    if argv and argv[0] not in SUBCOMMANDS and not argv[0].startswith("-"):
        argv = ["profile", *argv]
    args = build_parser().parse_args(argv)

    if args.cmd == "list-queries":
        # no Spark needed: queries() builds closures without a session
        import __spark_entry__ as entrymod
        q, o = entrymod.queries(), entrymod.oracle_sql()
        for i, name in enumerate(q):
            gate = "gated " if i < 50 else ("oracle" if name in o
                                            else "rows  ")
            print(f"{i + 1:4d}  [{gate}]  {name}")
        return 0

    from flink_descriptive_stats_spark.session import get_spark
    spark = get_spark(app_name=f"{args.cmd}-cli", master=args.master)

    if args.cmd == "explain":
        import __spark_entry__ as entrymod
        q = entrymod.queries()
        if args.query not in q:
            print(f"unknown query {args.query!r}; see list-queries",
                  file=sys.stderr)
            return 2
        df = q[args.query](spark, args.sf_dir)
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
        return 0

    if args.cmd == "profile":
        from flink_descriptive_stats_spark.operators import profile as prof
        from flink_descriptive_stats_spark.operators import topk
        from flink_descriptive_stats_spark.report import render_profile
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        if cols:
            df = df.select(*cols)
        # cache: the profile agg and top-K pass share one materialized scan
        df = df.cache()
        profile_df = prof.profile(df)
        # all-numeric tables have no token column to rank — skip, don't raise
        run_topk = not args.no_topk and topk.string_columns(df)
        topk_df = topk.topk_tokens(df) if run_topk else None
        complete_df = prof.complete_row_count(df)
        if args.output:
            _emit(profile_df, args.output)
        else:
            print(render_profile(profile_df, topk_df, complete_df))
        df.unpersist()
        return 0

    if args.cmd == "dedup":
        from flink_descriptive_stats_spark.operators import dedup
        df = _load(spark, args.input, args.format)
        kw = dict(content_col=args.text_col, id_col=args.id_col)
        out = {
            "exact": lambda: dedup.exact_dedup(df, **kw),
            "keep-first": lambda: dedup.keep_first(df, **kw),
            "minhash-pairs": lambda: dedup.minhash_dedup_pairs(
                df, threshold=args.threshold, **kw),
            "simhash-pairs": lambda: dedup.simhash_near_pairs(df, **kw),
            "corpus": lambda: dedup.dedup_corpus(
                df, threshold=args.threshold, **kw),
            "jaccard-pairs": lambda: dedup.ngram_jaccard_pairs(
                df, threshold=args.threshold, **kw),
            "containment-pairs": lambda: dedup.ngram_containment_pairs(
                df, threshold=args.threshold, **kw),
            "dup-fraction": lambda: dedup.duplicated_ngram_fraction(
                df, **kw),
            "canonical": lambda: dedup.canonical_dedup(df, **kw),
            "keep-best": lambda: dedup.keep_best_canonical(df, **kw),
            "jaccard-prefix": lambda: dedup.ngram_jaccard_pairs_prefix(
                df, threshold=args.threshold, **kw),
            "corpus-keep-best": lambda: dedup.dedup_corpus_keep_best(
                df, threshold=args.threshold, **kw),
        }[args.method]()
        _emit(out, args.output)
        return 0

    if args.cmd == "decontaminate":
        from flink_descriptive_stats_spark.operators import dedup
        train = _load(spark, args.train, args.format)
        holdout = _load(spark, args.holdout, args.format)
        if args.by_url and (args.bloom or args.fuzzy):
            print("error: --by-url cannot combine with --bloom/--fuzzy",
                  file=sys.stderr)
            return 2
        if args.spans and (args.bloom or args.fuzzy or args.by_url):
            print("error: --spans cannot combine with "
                  "--bloom/--fuzzy/--by-url", file=sys.stderr)
            return 2
        if args.spans:
            from flink_descriptive_stats_spark.operators.dedup import \
                decontaminate_spans
            _emit(decontaminate_spans(train, holdout,
                                      content_col=args.text_col,
                                      id_col=args.id_col,
                                      min_ngram=args.span_ngram),
                  args.output)
            return 0
        if args.by_url:
            from flink_descriptive_stats_spark.operators import urls
            _emit(urls.decontaminate_by_url(train, holdout,
                                            url_col=args.url_col),
                  args.output)
            return 0
        if args.bloom:
            out = dedup.decontaminate_bloom(
                train, holdout, content_col=args.text_col,
                id_col=args.id_col)
        else:
            out = dedup.decontaminate(train, holdout,
                                      content_col=args.text_col,
                                      id_col=args.id_col, fuzzy=args.fuzzy)
        _emit(out, args.output)
        return 0

    if args.cmd in ("text-stats", "quality-filter", "pii-scan",
                    "pii-redact"):
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        fn = {"text-stats": text_ops.text_stats,
              "quality-filter": text_ops.quality_filter,
              "pii-scan": text_ops.pii_scan,
              "pii-redact": text_ops.pii_redact}[args.cmd]
        _emit(fn(df, text_col=args.text_col, id_col=args.id_col),
              args.output)
        return 0

    if args.cmd == "ann":
        from flink_descriptive_stats_spark.operators import similarity
        df = _load(spark, args.input, args.format)
        kw = dict(k=args.k, vec_col=args.vec_col, id_col=args.id_col)

        def _default_index_path(kind: str) -> str:
            # input-keyed default so two datasets never share a stale
            # index; an explicit --index-path overrides
            import hashlib
            import os
            import tempfile
            tag = hashlib.md5(args.input.encode()).hexdigest()[:12]
            return os.path.join(tempfile.gettempdir(),
                                f"fds_{kind}_{tag}")

        def _ann_pq_index():
            import os
            path = args.index_path or _default_index_path("pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_pq_index(df, path, id_col=args.id_col,
                                          vec_col=args.vec_col)
            return similarity.pq_index_topk(df, path, **kw)

        def _ann_ivf_pq_index():
            import os
            path = args.index_path or _default_index_path("ivf_pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_ivf_pq_index(
                    df, path, id_col=args.id_col, vec_col=args.vec_col)
            return similarity.ivf_pq_index_topk(df, path, **kw)

        def _ann_index_stats():
            # the cell-fill health datasheet of a persisted index (built
            # from the input if absent — the fresh-build baseline reading)
            import os
            path = args.index_path or _default_index_path("ivf_pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_ivf_pq_index(
                    df, path, id_col=args.id_col, vec_col=args.vec_col)
            return similarity.index_stats(spark, path)

        def _ann_compact_index():
            # the alarm remediation: fold every append epoch into one
            # fresh base (no re-encode; search unchanged), then report
            # the post-compaction datasheet
            path = args.index_path or _default_index_path("pq_index")
            r = similarity.compact_index(spark, path)
            print(f"compacted {path}: {r}", file=sys.stderr)
            return similarity.index_stats(spark, path)

        def _ann_rebuild_index():
            # the heavy remediation: retrain on the CURRENT input —
            # sidecar geometry by default, or overridden (--n-cells /
            # --m / --ksub: the growth remediation) — and re-encode
            path = args.index_path or _default_index_path("pq_index")
            similarity.rebuild_index(df, path, id_col=args.id_col,
                                     vec_col=args.vec_col,
                                     n_cells=args.n_cells, m=args.m,
                                     ksub=args.ksub)
            return similarity.index_stats(spark, path)

        def _ann_index_recall():
            # measured recall@k vs exact brute force per n_probe — the
            # sweep to run before committing a deployment's probe budget
            import os
            path = args.index_path or _default_index_path("ivf_pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_ivf_pq_index(
                    df, path, id_col=args.id_col, vec_col=args.vec_col)
            grid = tuple(int(x) for x in args.n_probes.split(","))
            return similarity.index_recall_calibration(
                df, path, k=args.k, n_probes=grid,
                id_col=args.id_col, vec_col=args.vec_col)

        def _ann_index_refine():
            # recall@k per refine level — the flat-PQ recall instrument
            # (works on IVF-PQ too, at a fixed full-probe budget)
            import os
            path = args.index_path or _default_index_path("pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_pq_index(
                    df, path, id_col=args.id_col, vec_col=args.vec_col)
            grid = tuple(int(x) for x in args.refines.split(","))
            return similarity.index_refine_calibration(
                df, path, k=args.k, refines=grid,
                id_col=args.id_col, vec_col=args.vec_col)

        def _ann_index_calibration():
            # |ADC - exact| against the STORED books: the rebuild signal
            # after retrain-free appends
            import os
            path = args.index_path or _default_index_path("pq_index")
            if not os.path.exists(os.path.join(path, "meta.json")):
                similarity.write_pq_index(df, path, id_col=args.id_col,
                                          vec_col=args.vec_col)
            return similarity.pq_index_calibration(
                df, path, id_col=args.id_col, vec_col=args.vec_col)
        out = {
            "brute": lambda: similarity.brute_force_topk(df, **kw),
            "lsh": lambda: similarity.lsh_topk(df, **kw),
            "lsh-multiprobe": lambda: similarity.lsh_topk(
                df, multiprobe=True, **kw),
            "ivf": lambda: similarity.ivf_topk(df, **kw),
            "ivf-kmeans": lambda: similarity.ivf_topk(
                df, refine_iters=2, **kw),
            "pq": lambda: similarity.pq_topk(df, **kw),
            "ivf-pq": lambda: similarity.ivf_pq_topk(df, **kw),
            # est-vs-exact ADC cosine error: the pre-encode codebook check
            "pq-calibration": lambda: similarity.pq_calibration(
                df, vec_col=args.vec_col, id_col=args.id_col),
            "pq-index": lambda: _ann_pq_index(),
            "ivf-pq-index": lambda: _ann_ivf_pq_index(),
            "index-stats": lambda: _ann_index_stats(),
            "index-calibration": lambda: _ann_index_calibration(),
            "compact-index": lambda: _ann_compact_index(),
            "rebuild-index": lambda: _ann_rebuild_index(),
            "index-recall": lambda: _ann_index_recall(),
            "index-refine": lambda: _ann_index_refine(),
        }[args.method]()
        _emit(out, args.output)
        return 0

    if args.cmd == "media-neardup":
        from pyspark.sql import functions as F

        from flink_descriptive_stats_spark.operators import multimodal
        df = _load(spark, args.input, args.format)
        mh = args.max_hamming or (6 if args.kind == "image" else 8)
        nb = "auto" if args.n_bands == "auto" else int(args.n_bands)
        if args.kind == "auto" and not args.dedup:
            print("--kind auto requires --dedup (pair lists are "
                  "per-modality; the mixed keep set is the auto "
                  "product)", file=sys.stderr)
            return 2
        if args.dedup and args.calibrate:
            # ADVICE r9 #4: the if/elif below would silently run the
            # dedup path and drop --calibrate — reject the combination
            print("--dedup and --calibrate are mutually exclusive "
                  "(dedup emits the keep set, calibrate the per-distance "
                  "recall table — run them as two invocations)",
                  file=sys.stderr)
            return 2
        if args.dedup:
            out = multimodal.media_dedup_corpus(
                df, kind=args.kind, max_hamming=args.max_hamming,
                n_bands=nb, payload_col=args.payload_col,
                id_col=args.id_col)
        elif args.calibrate:
            fp = (multimodal.image_phash if args.kind == "image"
                  else multimodal.audio_fingerprint)
            hs = (fp(df, payload_col=args.payload_col,
                     id_col=args.id_col)
                  .where(F.col("decoded")).select("id", "phash"))
            out = multimodal.hamming_calibration(hs, max_hamming=mh,
                                                 n_bands=nb)
        elif args.kind == "image":
            out = multimodal.image_neardup_pairs(
                df, max_hamming=mh, n_bands=nb,
                payload_col=args.payload_col, id_col=args.id_col)
        else:
            out = multimodal.audio_neardup_pairs(
                df, max_hamming=mh, n_bands=nb,
                payload_col=args.payload_col, id_col=args.id_col)
        _emit(out, args.output)
        return 0

    if args.cmd == "compression":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.compression_ratio(df, text_col=args.text_col,
                                         id_col=args.id_col), args.output)
        return 0

    if args.cmd == "extract":
        from flink_descriptive_stats_spark.operators import markup
        df = _load(spark, args.input, args.format)
        fn = markup.markup_density if args.density else markup.extract_text
        _emit(fn(df, html_col=args.html_col, id_col=args.id_col),
              args.output)
        return 0

    if args.cmd == "urls":
        from flink_descriptive_stats_spark.operators import urls as url_ops
        modes = [bool(args.mix), args.cap is not None,
                 args.block is not None]
        if sum(modes) > 1:
            print("error: --mix, --cap, and --block are mutually "
                  "exclusive modes; pick one", file=sys.stderr)
            return 2
        df = _load(spark, args.input, args.format)
        sfx = args.suffixes.split(",") if args.suffixes else None
        if args.block is not None:
            out = url_ops.block_domains(
                df, blocked=args.block.split(","),
                url_col=args.url_col, id_col=args.id_col, suffixes=sfx)
        elif args.cap is not None:
            out = url_ops.cap_domains(df, url_col=args.url_col,
                                      id_col=args.id_col,
                                      max_per_domain=args.cap,
                                      suffixes=sfx)
        elif args.mix:
            out = url_ops.domain_mix(df, url_col=args.url_col,
                                     id_col=args.id_col, suffixes=sfx)
        else:
            out = url_ops.url_components(df, url_col=args.url_col,
                                         id_col=args.id_col,
                                         suffixes=sfx)
        _emit(out, args.output)
        return 0

    if args.cmd == "label-separation":
        from flink_descriptive_stats_spark.operators import similarity
        df = _load(spark, args.input, args.format)
        _emit(similarity.label_separation(df, id_col=args.id_col,
                                          vec_col=args.vec_col,
                                          label_col=args.label_col),
              args.output)
        return 0

    if args.cmd == "join-advisor":
        from flink_descriptive_stats_spark.operators import joins
        left = _load(spark, args.left, args.format)
        right = _load(spark, args.right, args.format)
        keys = args.key.split(",")
        ka, kb = (keys[0], keys[1]) if len(keys) == 2 else (keys[0], None)
        _emit(joins.join_advisor(left, right, ka, kb), args.output)
        return 0

    if args.cmd == "paragraph-dedup":
        from flink_descriptive_stats_spark.operators import dedup
        df = _load(spark, args.input, args.format)
        _emit(dedup.paragraph_dedup(df, content_col=args.text_col,
                                    id_col=args.id_col,
                                    window_tokens=args.window_tokens),
              args.output)
        return 0

    if args.cmd == "label-purity":
        from flink_descriptive_stats_spark.operators import similarity
        df = _load(spark, args.input, args.format)
        _emit(similarity.label_purity(df, n_cells=args.n_cells,
                                      id_col=args.id_col,
                                      vec_col=args.vec_col,
                                      label_col=args.label_col),
              args.output)
        return 0

    if args.cmd == "dataset-card":
        from flink_descriptive_stats_spark.operators.quality import (
            dataset_card, dataset_card_by_source)
        df = _load(spark, args.input, args.format)
        sfx = (args.url_suffixes.split(",")
               if args.url_suffixes else None)
        if args.by_source:
            out = dataset_card_by_source(
                df, text_col=args.text_col, id_col=args.id_col,
                source_col=args.source_col,
                url_col=args.card_url_col, url_suffixes=sfx,
                cleaning_section=args.cleaning,
                single_pass=not args.five_pass)
        else:
            out = dataset_card(df, text_col=args.text_col,
                               id_col=args.id_col,
                               source_col=args.source_col,
                               exact=not args.approx,
                               payload_col=args.payload_col,
                               media_kind=args.media_kind,
                               url_col=args.card_url_col,
                               url_suffixes=sfx,
                               cleaning_section=args.cleaning,
                               boilerplate_phrases=args.boilerplate_phrase,
                               single_pass=not args.five_pass)
        _emit(out, args.output)
        return 0

    if args.cmd == "temperature-mix":
        from flink_descriptive_stats_spark.operators import sampling
        df = _load(spark, args.input, args.format)
        _emit(sampling.temperature_mixture_sample(
            df, alpha=args.alpha, target_fraction=args.target_fraction,
            source_col=args.source_col, id_col=args.id_col,
            weight_col=args.weight_col), args.output)
        return 0

    if args.cmd == "fuzzy-join":
        from flink_descriptive_stats_spark.operators import joins
        left = _load(spark, args.left, args.format)
        right = _load(spark, args.right, args.format)
        keys = args.key.split(",")
        ka, kb = (keys[0], keys[1]) if len(keys) == 2 else (keys[0], None)
        _emit(joins.fuzzy_key_join(left, right, ka, kb,
                                   max_dist=args.max_dist), args.output)
        return 0

    if args.cmd == "keys":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.key_candidates(df, columns=cols), args.output)
        return 0

    if args.cmd == "curate":
        from flink_descriptive_stats_spark.operators.quality import \
            curate_corpus
        train = _load(spark, args.train, args.format)
        holdout = _load(spark, args.holdout, args.format)
        _emit(curate_corpus(train, holdout, text_col=args.text_col,
                            id_col=args.id_col, min_score=args.min_score,
                            strata_col=args.strata_col, cap=args.cap,
                            url_col=args.url_col,
                            max_per_domain=args.max_per_domain,
                            clean=args.clean,
                            despan_min_df=args.despan_min_df,
                            dedup_lines=args.dedup_lines),
              args.output)
        return 0

    if args.cmd == "source-overlap":
        from flink_descriptive_stats_spark.operators import dedup
        if args.fuzzy and args.canonical:
            print("error: --fuzzy and --canonical are exclusive "
                  "keying modes; pick one", file=sys.stderr)
            return 2
        df = _load(spark, args.input, args.format)
        if args.fuzzy:
            out = dedup.source_overlap_fuzzy(
                df, content_col=args.text_col,
                source_col=args.source_col, threshold=args.threshold)
        else:
            out = dedup.source_overlap(df, content_col=args.text_col,
                                       source_col=args.source_col,
                                       canonical=args.canonical)
        _emit(out, args.output)
        return 0

    if args.cmd == "dup-rate":
        from flink_descriptive_stats_spark.operators import dedup
        df = _load(spark, args.input, args.format)
        _emit(dedup.dup_rate_by_source(df, content_col=args.text_col,
                                       source_col=args.source_col),
              args.output)
        return 0

    if args.cmd == "temporal-split":
        from flink_descriptive_stats_spark.operators import sampling
        df = _load(spark, args.input, args.format)
        _emit(sampling.temporal_split(df, ts_col=args.ts_col,
                                      holdout_frac=args.holdout_frac),
              args.output)
        return 0

    if args.cmd == "pack-bfd":
        from flink_descriptive_stats_spark.operators import sampling
        df = _load(spark, args.input, args.format)
        fn = (sampling.pack_stats_bfd if args.stats
              else sampling.pack_sequences_bfd)
        _emit(fn(df, text_col=args.text_col, id_col=args.id_col,
                 max_tokens=args.max_tokens, n_shards=args.n_shards,
                 n_tokens_col=args.n_tokens_col),
              args.output)
        return 0

    if args.cmd == "k-anonymity":
        from flink_descriptive_stats_spark.operators.quality import \
            k_anonymity
        df = _load(spark, args.input, args.format)
        _emit(k_anonymity(df, args.cols.split(","), k=args.k), args.output)
        return 0

    if args.cmd == "quality-ensemble":
        from flink_descriptive_stats_spark.operators.quality import \
            quality_ensemble
        df = _load(spark, args.input, args.format)
        _emit(quality_ensemble(df, text_col=args.text_col,
                               id_col=args.id_col), args.output)
        return 0

    if args.cmd == "entropy":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.column_entropy(df, columns=cols), args.output)
        return 0

    if args.cmd == "refint":
        from flink_descriptive_stats_spark.operators import extras
        fact = _load(spark, args.fact, args.format)
        dim = _load(spark, args.dim, args.format)
        def _rk(spec):
            cols = tuple(c for c in spec.split(",") if c)
            return cols[0] if len(cols) == 1 else cols
        _emit(extras.referential_integrity(fact, dim, _rk(args.fk),
                                           _rk(args.pk)),
              args.output)
        return 0

    if args.cmd == "clean":
        from flink_descriptive_stats_spark.operators import cleaning
        if args.report and args.nfc:
            print("error: --report and --nfc are exclusive modes; "
                  "pick one", file=sys.stderr)
            return 2
        df = _load(spark, args.input, args.format)
        if args.report:
            out = cleaning.cleaning_report(df, text_col=args.text_col,
                                           id_col=args.id_col)
        elif args.nfc:
            out = cleaning.nfc_normalize(df, text_col=args.text_col,
                                         id_col=args.id_col)
        else:
            out = cleaning.clean_text(df, text_col=args.text_col,
                                      id_col=args.id_col)
        _emit(out, args.output)
        return 0

    if args.cmd == "remove-spans":
        from flink_descriptive_stats_spark.operators.dedup import (
            boilerplate_ngrams, remove_repeated_spans)
        df = _load(spark, args.input, args.format)
        if args.report_top is not None and args.phrase:
            print("error: --report-top and --phrase are exclusive "
                  "modes; pick one", file=sys.stderr)
            return 2
        if args.report_top is not None:
            out = boilerplate_ngrams(df, text_col=args.text_col,
                                     id_col=args.id_col,
                                     min_ngram=args.min_ngram,
                                     min_df=args.min_df,
                                     k=args.report_top,
                                     max_ngram=args.max_ngram)
        elif args.phrase:
            from flink_descriptive_stats_spark.operators.dedup import \
                remove_listed_spans
            out = remove_listed_spans(df, args.phrase,
                                      text_col=args.text_col,
                                      id_col=args.id_col)
        else:
            out = remove_repeated_spans(df, text_col=args.text_col,
                                        id_col=args.id_col,
                                        min_ngram=args.min_ngram,
                                        min_df=args.min_df,
                                        max_ngram=args.max_ngram)
        _emit(out, args.output)
        return 0

    if args.cmd == "dedup-lines":
        from flink_descriptive_stats_spark.operators.dedup import (
            DEDUP_MAX_LINES, dedup_lines)
        df = _load(spark, args.input, args.format)
        ml = (DEDUP_MAX_LINES if args.max_lines is None
              else (None if args.max_lines == 0 else args.max_lines))
        _emit(dedup_lines(df, text_col=args.text_col,
                          id_col=args.id_col, max_lines=ml),
              args.output)
        return 0

    if args.cmd == "fk":
        from flink_descriptive_stats_spark.operators import \
            dependencies as deps
        child = _load(spark, args.child, args.format)
        parent = _load(spark, args.parent, args.format)
        if args.orphans and args.repair:
            print("error: --orphans and --repair are exclusive modes; "
                  "pick one", file=sys.stderr)
            return 2
        def _key(spec):
            cols = tuple(c for c in spec.split(",") if c)
            return cols[0] if len(cols) == 1 else cols
        ck, pk = _key(args.child_col), _key(args.parent_col)
        if args.repair:
            out = deps.fk_repair(child, parent, ck, pk,
                                 action=args.repair)
        elif args.orphans:
            out = deps.fk_orphan_rows(child, parent, ck, pk)
        else:
            out = deps.inclusion_dependencies(
                [(args.child, child, ck, args.parent, parent, pk)])
        _emit(out, args.output)
        return 0

    if args.cmd == "fk-discover":
        import os.path
        from flink_descriptive_stats_spark.operators import \
            dependencies as deps
        tables = {}
        for path in args.inputs:
            name = os.path.splitext(os.path.basename(path.rstrip("/")))[0]
            if name in tables:
                print(f"error: duplicate table name {name!r} "
                      "(file stems must be unique)", file=sys.stderr)
                return 2
            tables[name] = _load(spark, path, args.format)
        _emit(deps.fk_discover(tables,
                               min_containment=args.min_containment,
                               max_key_width=args.max_key_width),
              args.output)
        return 0

    if args.cmd == "delta":
        from flink_descriptive_stats_spark.operators import delta as dlt
        if sum([bool(args.summary), bool(args.by_source),
                bool(args.schema)]) > 1:
            print("error: --summary, --by-source, and --schema are "
                  "exclusive modes; pick one", file=sys.stderr)
            return 2
        old = _load(spark, args.old, args.format)
        new = _load(spark, args.new, args.format)
        cols = tuple(args.content_cols.split(","))
        if args.schema:
            out = dlt.schema_diff(old, new)
        elif args.summary:
            out = dlt.delta_summary(old, new, id_col=args.id_col,
                                    content_cols=cols)
        elif args.by_source:
            out = dlt.delta_by_source(old, new, source_col=args.by_source,
                                      id_col=args.id_col,
                                      content_cols=cols)
        else:
            out = dlt.corpus_delta(old, new, id_col=args.id_col,
                                   content_cols=cols)
        _emit(out, args.output)
        return 0

    if args.cmd == "benford":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        _emit(extras.benford_digits(df, args.column), args.output)
        return 0

    if args.cmd == "tfidf":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.tfidf_top_terms(df, text_col=args.text_col,
                                       id_col=args.id_col, k=args.k),
              args.output)
        return 0

    if args.cmd == "funnel":
        from flink_descriptive_stats_spark.operators import events as ev_ops
        df = _load(spark, args.input, args.format)
        _emit(ev_ops.funnel(df, steps=tuple(args.steps.split(",")),
                            key_col=args.key_col, type_col=args.type_col,
                            ts_col=args.ts_col), args.output)
        return 0

    if args.cmd == "retention":
        from flink_descriptive_stats_spark.operators import events as ev_ops
        df = _load(spark, args.input, args.format)
        _emit(ev_ops.retention_cohorts(df, key_col=args.key_col,
                                       ts_col=args.ts_col,
                                       max_offset=args.max_offset),
              args.output)
        return 0

    if args.cmd == "resample":
        from flink_descriptive_stats_spark.operators import events as ev_ops
        df = _load(spark, args.input, args.format)
        _emit(ev_ops.resample(df, every_minutes=args.every_minutes,
                              ts_col=args.ts_col, value_col=args.value_col,
                              fill=args.fill), args.output)
        return 0

    if args.cmd == "robust-outliers":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.robust_outlier_counts(df, columns=cols,
                                           threshold=args.threshold),
              args.output)
        return 0

    if args.cmd == "fd":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        pairs = [tuple(p.split("->")) for p in args.pairs.split(",")]
        _emit(extras.fd_candidates(df, pairs=pairs), args.output)
        return 0

    if args.cmd == "check":
        from flink_descriptive_stats_spark.operators import quality
        df = _load(spark, args.input, args.format)
        rules = parse_rules(args.rules)
        out = (quality.check_constraints_by(df, rules, args.by)
               if args.by else quality.check_constraints(df, rules))
        _emit(out, args.output)
        return 0

    if args.cmd == "acf":
        from flink_descriptive_stats_spark.operators import events as ev
        df = _load(spark, args.input, args.format)
        _emit(ev.autocorrelation(df, key_col=args.key_col,
                                 ts_col=args.ts_col, id_col=args.id_col,
                                 value_col=args.value_col,
                                 max_lag=args.max_lag), args.output)
        return 0

    if args.cmd == "transitions":
        from flink_descriptive_stats_spark.operators import events as ev
        df = _load(spark, args.input, args.format)
        _emit(ev.transition_matrix(df, key_col=args.key_col,
                                   type_col=args.type_col,
                                   ts_col=args.ts_col,
                                   id_col=args.id_col), args.output)
        return 0

    if args.cmd == "rollup":
        from flink_descriptive_stats_spark.operators import events as ev
        df = _load(spark, args.input, args.format)
        _emit(ev.rollup_profile(df, key_col=args.key_col,
                                ts_col=args.ts_col,
                                value_col=args.value_col), args.output)
        return 0

    if args.cmd == "typos":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.typo_pairs(df, text_col=args.text_col,
                                  max_dist=args.max_dist,
                                  min_count=args.min_count), args.output)
        return 0

    if args.cmd == "semdedup":
        from flink_descriptive_stats_spark.operators import similarity
        df = _load(spark, args.input, args.format)
        _emit(similarity.semdedup(df, threshold=args.threshold,
                                  n_cells=args.n_cells,
                                  refine_iters=args.refine_iters,
                                  id_col=args.id_col,
                                  vec_col=args.vec_col), args.output)
        return 0

    if args.cmd == "trend":
        from flink_descriptive_stats_spark.operators import events as ev
        df = _load(spark, args.input, args.format)
        _emit(ev.trend(df, key_col=args.key_col, ts_col=args.ts_col,
                       value_col=args.value_col), args.output)
        return 0

    if args.cmd == "lm-score":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.lm_score(df, text_col=args.text_col,
                                id_col=args.id_col), args.output)
        return 0

    if args.cmd == "lang-segments":
        from flink_descriptive_stats_spark.operators import text as t_ops
        df = _load(spark, args.input, args.format)
        _emit(t_ops.lang_segments(df, text_col=args.text_col,
                                  id_col=args.id_col,
                                  max_tokens=args.max_tokens),
              args.output)
        return 0

    if args.cmd == "lang-confusion":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.lang_confusion(df, text_col=args.text_col,
                                      lang_col=args.lang_col), args.output)
        return 0

    if args.cmd == "histogram2d":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        _emit(extras.histogram2d(df, args.x, args.y, bins=args.bins),
              args.output)
        return 0

    if args.cmd == "doc-clusters":
        from flink_descriptive_stats_spark.operators import text as text_ops
        df = _load(spark, args.input, args.format)
        _emit(text_ops.doc_clusters(df, k=args.k, dim=args.dim,
                                    refine_iters=args.refine_iters,
                                    text_col=args.text_col,
                                    id_col=args.id_col), args.output)
        return 0

    if args.cmd == "cluster-sample":
        from flink_descriptive_stats_spark.operators import sampling
        df = _load(spark, args.input, args.format)
        _emit(sampling.cluster_balanced_sample(
            df, k_per_cluster=args.k_per_cluster,
            n_clusters=args.n_clusters, text_col=args.text_col,
            id_col=args.id_col), args.output)
        return 0

    if args.cmd == "session-summary":
        from flink_descriptive_stats_spark.streaming.pipeline_stream import (
            session_summary)
        df = _load(spark, args.input, args.format)
        _emit(session_summary(df, ts_col=args.ts_col,
                              key_col=args.key_col, gap=args.gap),
              args.output)
        return 0

    if args.cmd == "spearman":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.spearman_matrix(df, columns=cols,
                                     exact=not args.approx,
                                     n_buckets=args.buckets),
              args.output)
        return 0

    if args.cmd == "covariance":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.covariance_matrix(
            df, columns=cols, method="gram" if args.gram else None),
            args.output)
        return 0

    if args.cmd == "woe":
        from pyspark.sql import functions as F
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        _emit(extras.woe_iv(df, args.feature, F.expr(args.label),
                            bins=args.bins), args.output)
        return 0

    if args.cmd == "null-patterns":
        from flink_descriptive_stats_spark.operators import extras
        df = _load(spark, args.input, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.null_pattern_report(df, columns=cols), args.output)
        return 0

    if args.cmd == "paths":
        from flink_descriptive_stats_spark.operators import events as ev
        df = _load(spark, args.input, args.format)
        _emit(ev.event_paths(df, depth=args.depth, k=args.k,
                             key_col=args.key_col, type_col=args.type_col,
                             ts_col=args.ts_col, id_col=args.id_col),
              args.output)
        return 0

    if args.cmd in ("monitor-profile", "monitor-drift", "monitor-card"):
        from flink_descriptive_stats_spark.streaming.pipeline_stream import (
            start_card_monitor, start_drift_monitor, start_profile_monitor)
        schema = spark.read.parquet(args.input).schema
        stream = spark.readStream.schema(schema).parquet(args.input)
        if args.cmd == "monitor-profile":
            q = start_profile_monitor(
                stream, args.columns.split(","), args.sink,
                state_path=args.state, checkpoint_path=args.checkpoint)
        elif args.cmd == "monitor-card":
            q = start_card_monitor(
                stream, args.sink, state_path=args.state,
                checkpoint_path=args.checkpoint, text_col=args.text_col,
                id_col=args.id_col, source_col=args.source_col,
                boilerplate_phrases=args.boilerplate_phrase)
        else:
            ref = spark.read.parquet(args.reference)
            q = start_drift_monitor(
                stream, ref, args.column, args.sink, bins=args.bins,
                state_path=args.state, checkpoint_path=args.checkpoint)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        spark.read.parquet(args.sink).show(50, truncate=False)
        return 0

    if args.cmd == "compare":
        from flink_descriptive_stats_spark.operators import extras
        a = _load(spark, args.input_a, args.format)
        b = _load(spark, args.input_b, args.format)
        cols = args.columns.split(",") if args.columns else None
        _emit(extras.profile_compare(a, b, columns=cols), args.output)
        if args.ks_column:
            ks = (extras.ks_drift_approx if args.ks_approx
                  else extras.ks_drift)
            ks(a, b, args.ks_column).show()
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
