"""URL / domain analysis — the crawl-metadata companion of the markup
family.

A crawl corpus carries a URL per document, and the first curation
questions are metadata questions: which domains dominate (per-domain
caps), what the TLD mix is, how deep the average page sits, how much
carries query strings (session/tracking URLs are dedup bait). All
JVM-side regexp_extract / split built-ins — zero Python — with the
same Java-regex/RE2 common-subset discipline as operators/markup.py so
the DuckDB oracle (oracle_pipeline.url_components_sql / domain_mix_sql)
replays every expression literally.

The reference has no analog (it profiles typed columns,
ProfileJob.java:86-98); extension surface for the pipeline story.

Parsing contract (documented, deliberate — a regex parser, not an RFC
3986 state machine):

- scheme     lowercase ``[a-z][a-z0-9+.-]*`` before ``://``; a row
             without one parses to all-NULL components (kept, flagged
             ``valid=false`` — the triage row for malformed crawl
             metadata).
- host       authority up to the first ``/``, ``?`` or ``#``;
             lowercased; a trailing ``:port`` is stripped (the port is
             not a component we report).
- domain     the LAST TWO dot-labels of the host — a heuristic, NOT the
             public-suffix list: ``bbc.co.uk`` reports ``co.uk``
             (documented; carrying Mozilla's PSL is out of scope and
             the dominance/cap use case only needs a stable key).
             r11: every operator takes an optional ``suffixes`` list
             (user-supplied public suffixes, policy-scale, folded into
             the same codegen expression) for the ccTLD-heavy crawls
             where the 2-label heuristic is most wrong — see
             registrable_domain_expr.
- tld        the last label.
- path_depth the count of non-empty ``/`` segments after the host
             (0 for a bare domain, query/fragment excluded).
- has_query  a literal ``?`` anywhere after the scheme.

Scale: one narrow codegen Project (url_components); domain_mix is one
bounded groupBy(domain) — the same shuffle shape as the card's source
tally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_descriptive_stats_spark.functions.sig import sig6

#: scheme://  (group 1 = scheme) — anchored, lowercase-only by contract
SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
#: authority after the scheme (group 1), up to /, ? or #
HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
#: trailing :port on an authority
PORT_RE = ":[0-9]+$"
#: last two dot-labels (group 1) — the registrable-domain heuristic
DOMAIN_RE = "([^.]+[.][^.]+)$"
#: last label (group 1)
TLD_RE = "[.]([^.]+)$"
#: the path part (group 1): after authority, before ? or #
PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)"


def registrable_domain_expr(host, suffixes: list[str] | None = None):
    """The registrable-domain Column over a (lowercased, port-stripped)
    host: by default the documented 2-label heuristic (DOMAIN_RE —
    ``bbc.co.uk`` reports ``co.uk``). ``suffixes`` (r11) is the
    escape hatch for ccTLD-heavy crawls: a user-supplied set of
    public suffixes (e.g. ``["co.uk", "com.au"]``) folded into the
    SAME codegen expression, block_domains-style — a host ending in
    ``.suffix`` reports ``label.suffix`` (``bbc.co.uk`` ->
    ``bbc.co.uk``). Longer suffixes win (``a.b.uk`` entries override
    ``b.uk``); a host EQUAL to a suffix has no registrable label and
    falls back to the heuristic. Carrying Mozilla's full PSL stays
    out of scope — the list is policy-scale (folded as literals,
    no join), and the default is unchanged so existing oracles are
    byte-identical."""
    base = F.nullif(F.regexp_extract(host, DOMAIN_RE, 1), F.lit(""))
    if not suffixes:
        return base
    out = base
    # ascending label-count: the LAST when() applied is evaluated
    # FIRST, so longer (more specific) suffixes take precedence
    for s in sorted({x.lower().strip(".") for x in suffixes if x},
                    key=lambda x: (x.count("."), len(x), x)):
        esc = s.replace(".", "[.]")
        dom = F.nullif(
            F.regexp_extract(host, "([^.]+[.]" + esc + ")$", 1),
            F.lit(""))
        out = (F.when(host.endswith("." + s),
                      F.coalesce(dom, base)).otherwise(out))
    return out


def url_components(df: DataFrame, url_col: str = "url",
                   id_col: str = "doc_id",
                   suffixes: list[str] | None = None) -> DataFrame:
    """(id, valid, scheme, host, domain, tld, path_depth, has_query)
    per document — see the module docstring for the parsing contract.
    NULL urls are out of scope; malformed ones (no ``scheme://``) stay
    as valid=false rows with NULL components so the corpus's
    bad-metadata fraction is countable. ``suffixes`` (r11): optional
    public-suffix set for the domain column — see
    registrable_domain_expr."""
    c = F.col(url_col)
    scheme = F.nullif(F.regexp_extract(c, SCHEME_RE, 1), F.lit(""))
    raw_host = F.nullif(F.regexp_extract(c, HOST_RE, 1), F.lit(""))
    host = F.lower(F.regexp_replace(raw_host, PORT_RE, ""))
    path = F.nullif(F.regexp_extract(c, PATH_RE, 1), F.lit(""))
    depth = F.when(
        scheme.isNull(), F.lit(None).cast("bigint")
    ).otherwise(
        F.size(F.filter(F.split(F.coalesce(path, F.lit("")), "/"),
                        lambda x: x != "")).cast("bigint"))
    return (df.where(c.isNotNull())
            .select(
                F.col(id_col).alias("id"),
                scheme.isNotNull().alias("valid"),
                scheme.alias("scheme"),
                host.alias("host"),
                registrable_domain_expr(host, suffixes).alias("domain"),
                F.nullif(F.regexp_extract(host, TLD_RE, 1),
                         F.lit("")).alias("tld"),
                depth.alias("path_depth"),
                F.when(scheme.isNull(), F.lit(None).cast("boolean"))
                .otherwise(c.contains("?")).alias("has_query")))


def domain_mix(df: DataFrame, url_col: str = "url",
               id_col: str = "doc_id",
               suffixes: list[str] | None = None) -> DataFrame:
    """Per-domain dominance table: (domain, n_docs, share) over the
    VALID urls — the per-domain-cap planning view (a domain whose share
    dwarfs the rest is the upstream ticket, exactly like the card's
    max_source_share but keyed on crawl metadata). share is sig6 of
    n_docs / total valid docs. One bounded groupBy; invalid/malformed
    rows are excluded (they have no domain) and countable via
    url_components."""
    comp = url_components(df, url_col=url_col, id_col=id_col,
                          suffixes=suffixes)
    d = comp.where(F.col("domain").isNotNull())
    counts = d.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    # total via a broadcast 1-row cross join, not a global window: the
    # domain table is bounded either way, but this keeps the plan free
    # of the single-partition WindowExec shape
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return (counts.crossJoin(F.broadcast(total)).select(
        "domain", "n_docs",
        sig6(F.col("n_docs").cast("double")
             / F.col("__total").cast("double")).alias("share")))


def canonical_url_expr(c):
    """The normalized URL identity used by decontaminate_by_url: two
    URLs that differ only in scheme (http vs https), host case, an
    explicit port, a leading ``www.``, a query string / fragment, or a
    missing path vs ``/`` are the SAME page for decontamination
    purposes. Key = ``host_without_www + path`` (path defaulting to
    ``/``); a URL with no ``scheme://`` cannot be parsed, so it keys on
    its raw string (exact match still catches it). Trailing-slash
    differences INSIDE a path are kept verbatim (documented — path
    semantics are site-specific)."""
    scheme = F.nullif(F.regexp_extract(c, SCHEME_RE, 1), F.lit(""))
    raw_host = F.nullif(F.regexp_extract(c, HOST_RE, 1), F.lit(""))
    host = F.lower(F.regexp_replace(raw_host, PORT_RE, ""))
    host = F.regexp_replace(host, "^www[.]", "")
    path = F.nullif(F.regexp_extract(c, PATH_RE, 1), F.lit(""))
    return F.when(scheme.isNull(), c).otherwise(
        F.concat(host, F.coalesce(path, F.lit("/"))))


def decontaminate_by_url(train: DataFrame, holdout: DataFrame,
                         url_col: str = "url",
                         holdout_url_col: str | None = None) -> DataFrame:
    """URL-keyed eval-set decontamination — the metadata sibling of
    dedup.decontaminate: benchmarks routinely publish the SOURCE URLS
    of their documents, and matching on those catches contamination
    that text matching misses (the eval set holds an extract or a
    cleaned rendition of the page, not its verbatim text). Removes
    from ``train`` every row whose canonical URL (canonical_url_expr:
    scheme/case/port/www/query-insensitive) appears in ``holdout``.

    Scale: anti-join keyed on the canonical URL — holdout side
    distinct'd first; eval sets are small, so AQE broadcasts them and
    the train corpus never shuffles."""
    hc = F.col(holdout_url_col or url_col)
    hk = (holdout.where(hc.isNotNull())
          .select(canonical_url_expr(hc).alias("__uk")).distinct())
    return (train.withColumn("__uk",
                             canonical_url_expr(F.col(url_col)))
            .join(hk, "__uk", "anti")
            .drop("__uk"))


def cap_domains(df: DataFrame, url_col: str = "url",
                id_col: str = "doc_id", max_per_domain: int = 100,
                keep_invalid: bool = True,
                suffixes: list[str] | None = None) -> DataFrame:
    """Per-domain cap — the curation ACTION domain_mix plans for: keep
    at most ``max_per_domain`` documents per registrable domain,
    deterministically (lowest id first), so one crawl-heavy domain
    cannot dominate the training mix. Returns the input columns plus
    the ``domain`` each row was capped under.

    Rows with no domain (malformed metadata, valid=false) are KEPT by
    default — capping is a dominance remediation, not a validity
    filter; pass ``keep_invalid=False`` to drop them instead.

    Scale: one keyed shuffle (window partitioned by domain) with
    bounded per-group state — the same shape as keep-first dedup; the
    full rows ride the shuffle once and nothing is collected. The rank
    filter is the BARE ``__rn <= max_per_domain`` predicate on the
    domain-non-null branch (NULL-domain rows are handled by a separate
    union branch, not a CASE inside the filter) — deliberately, so
    Spark's InferWindowGroupLimit plans a partial WindowGroupLimit
    BELOW the Exchange: every map task pre-truncates each domain to
    ``max_per_domain`` rows before shuffling, which is exactly the
    skew guard a 30%-share crawl domain needs at 100 TB. A CASE-wrapped
    filter suppresses that rewrite (verified against the physical
    plan; pinned in tests/test_plan_shapes.py)."""
    from pyspark.sql import Window
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1, got "
                         f"{max_per_domain}")
    c = F.col(url_col)
    raw_host = F.nullif(F.regexp_extract(c, HOST_RE, 1), F.lit(""))
    host = F.lower(F.regexp_replace(raw_host, PORT_RE, ""))
    domain = registrable_domain_expr(host, suffixes)
    base = df.where(c.isNotNull()).withColumn("domain", domain)
    w = Window.partitionBy("domain").orderBy(F.col(id_col))
    capped = (base.where(F.col("domain").isNotNull())
              .withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= max_per_domain)
              .drop("__rn"))
    if keep_invalid:
        return capped.unionByName(base.where(F.col("domain").isNull()))
    return capped


# --------------------------------------------------------------------------
# deterministic URL fixture (crawl metadata synthesized from doc_id)
# --------------------------------------------------------------------------
#: (scheme, host, path template, query) shells, chosen to exercise the
#: whole contract: www/no-www, deep subdomain, explicit port, co.uk
#: (the documented 2-label heuristic boundary), uppercase host
#: (lowercased), bare domain (depth 0), deep path, query string, and
#: one malformed row (no scheme). No single quotes or backslashes.
URL_VARIANTS: tuple[str, ...] = (
    "https://www.example.com/articles/",
    "http://news.example.org/a/b/c",
    "https://EXAMPLE.net#frag",          # bare domain: depth 0, no query
    "https://cdn.static.example.io:8443/assets",
    "http://bbc.co.uk/news?page=",
    "www.broken-no-scheme.com/x",
)


def synth_url_expr(id_col):
    """doc_id -> a deterministic URL (variant by id % 6, id suffixed
    into the path/query so hosts repeat but URLs stay distinct) — the
    Spark side of the shared fixture (SQL twin:
    oracle_pipeline._synth_url_case)."""
    v = id_col.cast("bigint") % len(URL_VARIANTS)
    out = None
    for i, base in enumerate(URL_VARIANTS):
        branch = F.concat(F.lit(base), id_col.cast("string"))
        out = (F.when(v == i, branch) if out is None
               else out.when(v == i, branch))
    return out


def block_domains(df: DataFrame, blocked: list[str],
                  url_col: str = "url", id_col: str = "doc_id",
                  include_subdomains: bool = True,
                  keep_invalid: bool = True,
                  suffixes: list[str] | None = None) -> DataFrame:
    """Domain blocklist filter — the deny-list ACTION every crawl
    pipeline carries (spam/adult/SEO-farm domains): drop every row
    whose registrable domain (the same 2-label heuristic as
    url_components) matches an entry of ``blocked``; with
    ``include_subdomains`` (default) a HOST suffix match on
    ``.domain`` also blocks (ads.example.com under example.com — but
    NOT notexample.com, the dot anchors the label boundary).
    Malformed/scheme-less rows have no domain and are KEPT by default
    (blocklisting is a deny decision, not a validity filter;
    ``keep_invalid=False`` drops them). Blocklist entries are
    lowercased; NULL urls are out of scope.

    Scale: the blocklist is a driver-side literal set folded into ONE
    codegen filter (isin + a bounded OR of endswith) — no join, no
    shuffle, list size is policy-scale (thousands), not data-scale.
    For a data-scale blocklist, anti-join on the domain instead."""
    if not blocked:
        raise ValueError("block_domains needs at least one domain")
    bl = sorted({b.lower() for b in blocked})
    c = F.col(url_col)
    raw_host = F.nullif(F.regexp_extract(c, HOST_RE, 1), F.lit(""))
    host = F.lower(F.regexp_replace(raw_host, PORT_RE, ""))
    domain = registrable_domain_expr(host, suffixes)
    hit = domain.isin(bl)
    if include_subdomains:
        for b in bl:
            hit = hit | host.endswith("." + b) | (host == b)
    return (df.where(c.isNotNull())
            .where(F.when(domain.isNull() & host.isNull(),
                          F.lit(bool(keep_invalid)))
                   .otherwise(~F.coalesce(hit, F.lit(False)))))
