"""DuckDB oracle SQL for the LLM-pipeline operators (dedup, similarity,
text analysis) — mirrors operators/{dedup,similarity,text}.py expression by
expression. Shared constants (regexes, minhash parameters, hyperplanes) are
imported from the same modules the Spark side uses, so the two sides cannot
drift.
"""

from __future__ import annotations

from flink_descriptive_stats_spark.functions import hashing as H
from flink_descriptive_stats_spark.functions.sig import duck_sig6
from flink_descriptive_stats_spark.operators import text as TX

P = H.MERSENNE_P


def _tokens_cte(table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    # NULL-content rows are excluded on both sides (the Spark operators
    # filter isNotNull): a NULL document has no content to analyze.
    return (f"t AS (SELECT {id_col} AS id, {text_col} AS text, "
            f"{H.duck_tokens(text_col)} AS toks FROM {table} "
            f"WHERE {text_col} IS NOT NULL)")


def _shingle_hash_cte(n: int = 3) -> str:
    sh = H.duck_shingles("toks", n)
    th = H.duck_token_hash("s")
    return (f"sh AS (SELECT id, list_transform(list_distinct({sh}), "
            f"s -> {th} % {P}) AS hashes FROM t)")


def dedup_exact_sql(table: str = "documents") -> str:
    return (f"SELECT md5(text) AS content_md5, "
            f"CAST(min(doc_id) AS BIGINT) AS rep_id, "
            f"CAST(count(*) AS BIGINT) AS dup_count "
            f"FROM {table} GROUP BY md5(text)")


def _sig_expr(j: int) -> str:
    a, b = H.MINHASH_PARAMS[j]
    return f"list_min(list_transform(hashes, x -> ({a} * x + {b}) % {P}))"


def minhash_signatures_sql(table: str = "documents") -> str:
    branches = [
        f"SELECT CAST(id AS BIGINT) AS id, {j} AS sig_idx, "
        f"CAST({_sig_expr(j)} AS BIGINT) AS sig_val FROM sh"
        for j in range(H.MINHASH_K)]
    return (f"WITH {_tokens_cte(table)}, {_shingle_hash_cte()}\n"
            + "\nUNION ALL\n".join(branches))


def _pairs_ctes(table: str = "documents", max_bucket: int = 1000) -> str:
    """CTE chain ending in ``j (id_a, id_b, jaccard)`` — shared by the
    pair query and the clustering oracle."""
    sig_cols = ", ".join(f"{_sig_expr(j)} AS sig_{j}"
                         for j in range(H.MINHASH_K))
    band_rows = []
    for b in range(H.LSH_BANDS):
        key = " || ',' || ".join(
            f"CAST(sig_{b * H.LSH_ROWS + r} AS VARCHAR)"
            for r in range(H.LSH_ROWS))
        band_rows.append(f"SELECT id, {b} AS band, {key} AS band_key FROM sw")
    return f"""{_tokens_cte(table)}, {_shingle_hash_cte()},
sw AS (SELECT id, hashes, {sig_cols} FROM sh),
bands_all AS ({' UNION ALL '.join(band_rows)}),
bands AS (SELECT * FROM bands_all
          QUALIFY count(*) OVER (PARTITION BY band, band_key) <= {max_bucket}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
j AS (SELECT id_a, id_b,
             CAST(len(list_intersect(ha.hashes, hb.hashes)) AS DOUBLE)
             / CAST(len(list_distinct(ha.hashes || hb.hashes)) AS DOUBLE)
             AS jaccard
      FROM cand
      JOIN sh ha ON ha.id = cand.id_a
      JOIN sh hb ON hb.id = cand.id_b)"""


def minhash_pairs_sql(table: str = "documents", threshold: float = 0.5,
                      max_bucket: int = 1000) -> str:
    return f"""
WITH {_pairs_ctes(table, max_bucket)}
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, jaccard
FROM j WHERE jaccard >= {threshold}
"""


def _cluster_ctes(table: str = "documents", threshold: float = 0.5,
                  max_bucket: int = 1000) -> str:
    """CTE chain ending in ``lab (id, cluster_id)`` — connected components
    of the near-dup pair graph via a recursive transitive closure (UNION
    dedups rows, so the recursion terminates on cyclic graphs), labeled by
    the component's smallest id. Mirrors dedup.neardup_clusters."""
    return f"""{_pairs_ctes(table, max_bucket)},
p AS (SELECT id_a, id_b FROM j WHERE jaccard >= {threshold}),
edges AS (SELECT id_a AS s, id_b AS t FROM p
          UNION SELECT id_b, id_a FROM p),
reach(s, t) AS (SELECT s, t FROM edges
                UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
comp AS (SELECT s AS id, least(s, min(t)) AS comp FROM reach GROUP BY s),
docs AS (SELECT doc_id AS id FROM {table} WHERE text IS NOT NULL),
lab AS (SELECT d.id, COALESCE(c.comp, d.id) AS cluster_id
        FROM docs d LEFT JOIN comp c USING (id))"""


def neardup_clusters_sql(table: str = "documents",
                         threshold: float = 0.5) -> str:
    return (f"WITH RECURSIVE {_cluster_ctes(table, threshold)} "
            f"SELECT CAST(id AS BIGINT) AS id, "
            f"CAST(cluster_id AS BIGINT) AS cluster_id FROM lab")


def dedup_corpus_sql(table: str = "documents",
                     threshold: float = 0.5) -> str:
    return (f"WITH RECURSIVE {_cluster_ctes(table, threshold)} "
            f"SELECT t.* FROM {table} t JOIN lab "
            f"ON t.doc_id = lab.id AND lab.id = lab.cluster_id")


def simhash_sql(table: str = "documents", bits: int = 32) -> str:
    th = H.duck_token_hash("s")
    terms = []
    for b in range(bits):
        w = 1 << b
        terms.append(
            f"(CASE WHEN COALESCE(list_sum(list_transform(hashes, "
            f"h -> CASE WHEN (h // {w}) % 2 = 1 THEN 1 ELSE -1 END)), 0) >= 0 "
            f"THEN {w} ELSE 0 END)")
    return (f"WITH {_tokens_cte(table)}, "
            f"h AS (SELECT id, list_transform(toks, s -> {th}) AS hashes "
            f"FROM t)\n"
            f"SELECT CAST(id AS BIGINT) AS id, "
            f"CAST({' + '.join(terms)} AS BIGINT) AS simhash FROM h")


def simhash_near_pairs_sql(table: str = "documents", bits: int = 32,
                           max_hamming: int = 3) -> str:
    """Mirror of dedup.simhash_near_pairs: 4 8-bit bands (pigeonhole
    blocking), candidate self-join, exact Hamming via bit_count(xor)."""
    th = H.duck_token_hash("s")
    terms = []
    for b in range(bits):
        w = 1 << b
        terms.append(
            f"(CASE WHEN COALESCE(list_sum(list_transform(hashes, "
            f"h -> CASE WHEN (h // {w}) % 2 = 1 THEN 1 ELSE -1 END)), 0) >= 0 "
            f"THEN {w} ELSE 0 END)")
    band_rows = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band, "
        f"(simhash // {1 << (8 * b)}) % 256 AS band_key FROM s"
        for b in range(4))
    return (f"WITH {_tokens_cte(table)}, "
            f"h AS (SELECT id, list_transform(toks, s -> {th}) AS hashes "
            f"FROM t), "
            f"s AS (SELECT id, CAST({' + '.join(terms)} AS BIGINT) AS simhash "
            f"FROM h), "
            f"bands AS ({band_rows}), "
            f"cand AS (SELECT DISTINCT a.id AS id_a, a.simhash AS sim_a, "
            f"b.id AS id_b, b.simhash AS sim_b "
            f"FROM bands a JOIN bands b ON a.band = b.band "
            f"AND a.band_key = b.band_key AND a.id < b.id) "
            f"SELECT CAST(id_a AS BIGINT) AS id_a, "
            f"CAST(id_b AS BIGINT) AS id_b, "
            f"CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming "
            f"FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}")


def ann_lsh_sql(table: str = "embeddings", k: int = 5, n_tables: int = 8,
                bits_per_table: int = 5, max_query_id: int = 10,
                dim: int = 64, multiprobe: bool = False) -> str:
    """Mirror of similarity.lsh_topk: banded multi-table hyperplane LSH
    (same deterministic plane constants, embedded as round-trip float
    literals on both sides), per-table bucket join unioned via DISTINCT,
    exact left-fold cosine re-rank. multiprobe=True expands each query
    bucket with its b Hamming-1 neighbors, like the Spark side."""
    from flink_descriptive_stats_spark.operators.similarity import (
        _hp_component)
    code_cols = []
    for t in range(n_tables):
        terms = []
        for j in range(bits_per_table):
            hp = [_hp_component(t * bits_per_table + j, i)
                  for i in range(dim)]
            arr = "[" + ", ".join(repr(c) for c in hp) + "]"
            dot = _DOT.format(a="v", b=f"({arr}::DOUBLE[])")
            terms.append(
                f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
        code_cols.append("(" + " + ".join(terms) + f") AS c{t}")
    corpus_rows = " UNION ALL ".join(
        f"SELECT id, v, norm, {t} AS tbl, c{t} AS bucket FROM nc"
        for t in range(n_tables))
    flips = [0] + ([1 << j for j in range(bits_per_table)]
                   if multiprobe else [])
    query_rows = " UNION ALL ".join(
        f"SELECT id, v, norm, {t} AS tbl, xor(c{t}, {f}) AS bucket FROM nc "
        f"WHERE id < {max_query_id}"
        for t in range(n_tables) for f in flips)
    dot_qc = _DOT.format(a="q.v", b="c.v")
    return f"""
WITH {_norm_cte(table)},
nc AS (SELECT id, v, norm, {', '.join(code_cols)} FROM n),
nb AS ({corpus_rows}),
q AS ({query_rows}),
scored AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
                  ({dot_qc}) / (q.norm * c.norm) AS cos
           FROM nb c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
           AND c.id != q.id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def ngram_jaccard_pairs_sql(table: str = "documents",
                            threshold: float = 0.3) -> str:
    return f"""
WITH {_tokens_cte(table)}, {_shingle_hash_cte()},
sizes AS (SELECT id, len(hashes) AS sz FROM sh),
expl AS (SELECT id, unnest(hashes) AS shingle FROM sh),
shared AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
           FROM expl a JOIN expl b ON a.shingle = b.shingle AND a.id < b.id
           GROUP BY a.id, b.id),
j AS (SELECT id_a, id_b,
             CAST(shared AS DOUBLE)
             / CAST(sa.sz + sb.sz - shared AS DOUBLE) AS jaccard
      FROM shared
      JOIN sizes sa ON sa.id = shared.id_a
      JOIN sizes sb ON sb.id = shared.id_b)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, jaccard
FROM j WHERE jaccard >= {threshold}
"""


def ngram_containment_pairs_sql(table: str = "documents",
                                threshold: float = 0.5) -> str:
    """Mirror of dedup.ngram_containment_pairs."""
    return f"""
WITH {_tokens_cte(table)}, {_shingle_hash_cte()},
sizes AS (SELECT id, len(hashes) AS sz FROM sh),
expl AS (SELECT id, unnest(hashes) AS shingle FROM sh),
shared AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
           FROM expl a JOIN expl b ON a.shingle = b.shingle AND a.id < b.id
           GROUP BY a.id, b.id),
c AS (SELECT id_a, id_b,
             CAST(shared AS DOUBLE) / sa.sz AS containment_a,
             CAST(shared AS DOUBLE) / sb.sz AS containment_b,
             CAST(shared AS DOUBLE)
             / CAST(sa.sz + sb.sz - shared AS DOUBLE) AS jaccard
      FROM shared
      JOIN sizes sa ON sa.id = shared.id_a
      JOIN sizes sb ON sb.id = shared.id_b)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       containment_a, containment_b, jaccard
FROM c WHERE containment_a >= {threshold} OR containment_b >= {threshold}
"""


def contamination_report_sql(table: str = "documents",
                             mod: int = 10) -> str:
    """Mirror of dedup.contamination_report over the doc_id%mod==0 holdout
    split of ``table`` (train = the rest)."""
    th = H.duck_token_hash("s")
    sh = H.duck_shingles("toks", 3)
    return f"""
WITH t AS (SELECT doc_id AS id, text,
                  {H.duck_tokens('text')} AS toks FROM {table}
           WHERE text IS NOT NULL),
hashed AS (SELECT id, list_transform(list_distinct({sh}),
                  s -> {th} % {P}) AS hashes FROM t),
h_expl AS (SELECT DISTINCT id, unnest(hashes) AS shingle FROM hashed
           WHERE id % {mod} = 0),
t_sh AS (SELECT DISTINCT unnest(hashes) AS shingle FROM hashed
         WHERE id % {mod} != 0)
SELECT CAST(h.id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       avg(CASE WHEN t_sh.shingle IS NOT NULL THEN 1.0 ELSE 0.0 END)
           AS matched_fraction
FROM h_expl h LEFT JOIN t_sh ON t_sh.shingle = h.shingle
GROUP BY h.id
"""


def _span_w2_cte(src: str) -> str:
    """The shared word/separator CTE of the span family over
    ``{src}(id, text)``."""
    return f"""sp_w2 AS (
  SELECT id, text,
         regexp_extract_all(text, '\\S+') AS words,
         regexp_extract(text, '^\\s*') AS lead,
         regexp_extract(text, '\\s*$') AS trail,
         len(regexp_extract_all(text, '\\S+')) AS m,
         list_slice(regexp_extract_all(text, '\\s+'),
                    CASE WHEN regexp_extract(text, '^\\s*') <> ''
                         THEN 2 ELSE 1 END,
                    CASE WHEN regexp_extract(text, '^\\s*') <> ''
                         THEN 2 ELSE 1 END
                    + greatest(len(regexp_extract_all(text, '\\S+'))
                               - 1, 0) - 1) AS core
  FROM {src})"""


def _span_mine_ctes(n: int, min_df: int) -> str:
    """The document-frequency MINING coverage: positional n-gram
    hashes -> df >= min_df -> sp_cov."""
    th = H.duck_token_hash(
        f"lower(array_to_string(list_slice(words, i, i + {n - 1}), ' '))")
    return f"""sp_ps AS (
  SELECT id, i - 1 AS i, {th} % {P} AS sh
  FROM (SELECT id, words,
               unnest(generate_series(1, m - {n} + 1)) AS i
        FROM sp_w2 WHERE m >= {n})),
sp_rep AS (
  SELECT sh FROM (SELECT DISTINCT sh, id FROM sp_ps)
  GROUP BY sh HAVING count(*) >= {min_df}),
sp_cov AS (
  SELECT DISTINCT p.id, p.i + d.d AS j
  FROM sp_ps p JOIN sp_rep USING (sh)
  CROSS JOIN (SELECT unnest(generate_series(0, {n - 1})) AS d) d)"""


def _span_rewrite_ctes() -> str:
    """The separator-preserving rewrite from sp_w2 + sp_cov to
    spanfinal — shared by the mined and the frozen-list variants (one
    SQL bundle, like Spark's _span_rewrite_select)."""
    return f"""sp_idx AS (SELECT id, unnest(generate_series(0, m - 1)) AS i
           FROM sp_w2 WHERE m > 0),
sp_kept AS (
  SELECT sp_idx.id, sp_idx.i FROM sp_idx
  LEFT JOIN sp_cov ON sp_cov.id = sp_idx.id AND sp_cov.j = sp_idx.i
  WHERE sp_cov.id IS NULL),
sp_ordered AS (
  SELECT id, i, lag(i) OVER (PARTITION BY id ORDER BY i) AS pi
  FROM sp_kept),
sp_body AS (
  SELECT o.id,
         string_agg(CASE WHEN o.pi IS NULL THEN ''
                         WHEN o.pi = o.i - 1 THEN w.core[o.i]
                         ELSE ' ' END || w.words[o.i + 1],
                    '' ORDER BY o.i) AS b
  FROM sp_ordered o JOIN sp_w2 w ON w.id = o.id GROUP BY o.id),
sp_st AS (
  SELECT c.id, count(*) AS nrm,
         count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM sp_cov c2
           WHERE c2.id = c.id AND c2.j = c.j - 1)) AS nsp
  FROM sp_cov c GROUP BY c.id),
spanfinal AS (
  SELECT w.id,
       CASE WHEN sp_st.nrm IS NULL THEN w.text
            ELSE CASE WHEN NOT EXISTS (SELECT 1 FROM sp_cov c
                                       WHERE c.id = w.id AND c.j = 0)
                      THEN w.lead ELSE '' END
                 || coalesce(sp_body.b, '')
                 || CASE WHEN NOT EXISTS (
                           SELECT 1 FROM sp_cov c
                           WHERE c.id = w.id AND c.j = w.m - 1)
                         THEN w.trail ELSE '' END
       END AS text_clean,
       CAST(w.m AS BIGINT) AS n_tokens,
       CAST(coalesce(sp_st.nrm, 0) AS BIGINT) AS n_tokens_removed,
       CAST(coalesce(sp_st.nsp, 0) AS BIGINT) AS n_spans_removed
  FROM sp_w2 w LEFT JOIN sp_st ON sp_st.id = w.id
  LEFT JOIN sp_body ON sp_body.id = w.id)"""


def _span_ctes(src: str, n: int, min_df: int) -> str:
    """The remove_repeated_spans contract as a reusable CTE chain from
    ``{src}(id, text)`` to ``spanfinal(id, text_clean, n_tokens,
    n_tokens_removed, n_spans_removed)`` — shared by the standalone
    gated query and the curate_corpus despan-stage composition. All
    CTE names are sp_-prefixed to compose without collisions."""
    return (_span_w2_cte(src) + ",\n" + _span_mine_ctes(n, min_df)
            + ",\n" + _span_rewrite_ctes())


def remove_repeated_spans_sql(table: str = "documents",
                              min_ngram: int = 5,
                              min_df: int = 25) -> str:
    """dedup.remove_repeated_spans mirrored on the shared boilerplate
    fixture (dedup.synth_span_expr — header on doc_id%3!=2, two-space
    footer on doc_id%4==0): whitespace-delimited words, positional
    lowercased n-gram hashes, document frequency >= min_df, covered
    positions consolidated, and the SEPARATOR-PRESERVING rewrite
    (each kept word re-joined with its original preceding separator;
    one-space splice across removed spans; lead/trail survive with
    the first/last word) replayed literally in SQL — the cleaned
    STRINGS themselves are hash-compared."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS text FROM sp_src),
{_span_ctes("sp_docs", int(min_ngram), int(min_df))}
SELECT * FROM spanfinal
"""


def _duck_per_n_threshold(min_df) -> str:
    """The DuckDB rendering of dedup._per_n_threshold: a plain literal
    for scalar ``min_df``, `CASE nn WHEN .. THEN .. END` for the
    per-length {n: df} dict — ONE definition shared by the span-mining
    CTEs and the triage-view mirror, matching the Spark side's single
    helper so the two SQL copies cannot drift either (r13 self-review
    #3)."""
    if isinstance(min_df, dict):
        arms = " ".join(f"WHEN {int(k)} THEN {int(v)}"
                        for k, v in sorted(min_df.items()))
        return f"CASE nn {arms} END"
    return str(int(min_df))


def _span_mine_multi_ctes(ns: list[int], min_df) -> str:
    """The MULTI-length document-frequency mining coverage (r12):
    every n in ``ns`` rides the unnest next to the start index, the
    gram is a variable-length list slice, and the hash input is
    nn::VARCHAR || ':' || gram — literally the Spark side's
    "{n}:{gram}" fold, so lengths never alias. ``min_df`` is a scalar
    or a {n: df} dict (CASE over nn)."""
    gram = ("lower(array_to_string("
            "list_slice(words, i, i + nn - 1), ' '))")
    th = H.duck_token_hash(f"nn::VARCHAR || ':' || {gram}")
    thr = _duck_per_n_threshold(min_df)
    ns_lit = ", ".join(str(int(k)) for k in ns)
    return f"""sp_ps AS (
  SELECT id, i - 1 AS i, nn, {th} % {P} AS sh
  FROM (SELECT id, words, nn,
               unnest(generate_series(1, m - nn + 1)) AS i
        FROM (SELECT id, words, m, unnest([{ns_lit}]) AS nn
              FROM sp_w2)
        WHERE m >= nn)),
sp_rep AS (
  SELECT sh FROM (SELECT DISTINCT sh, nn, id FROM sp_ps)
  GROUP BY sh, nn HAVING count(*) >= {thr}),
sp_cov AS (
  SELECT DISTINCT p.id, p.i + d.d AS j
  FROM sp_ps p JOIN sp_rep USING (sh)
  CROSS JOIN (SELECT unnest(generate_series(0, {max(ns) - 1})) AS d) d
  WHERE d.d < p.nn)"""


def remove_repeated_spans_multi_sql(table: str = "documents",
                                    min_ngram: int = 4,
                                    max_ngram: int = 7,
                                    min_df: int | dict = 25) -> str:
    """dedup.remove_repeated_spans(max_ngram=...) mirrored on the
    multi-n fixture (dedup.synth_span_multi_expr — the single-n
    header/footer planting PLUS the 4-word banner on doc_id%5==1
    that single-n mining at min_ngram=5 provably misses): per-length
    positional hashes with the length folded in, per-length DF
    thresholds, coverage union, then the SAME sp_ rewrite chain —
    the cleaned STRINGS are hash-compared."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr, ban = DD.SPAN_HEADER, DD.SPAN_FOOTER, DD.SPAN_SHORT
    hm, fm, sm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD, \
        DD.SPAN_SHORT_MOD
    ns = list(range(int(min_ngram), int(max_ngram) + 1))
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_src2 AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS t1 FROM sp_src),
sp_docs AS (
  SELECT id, CASE WHEN id % {sm} = 1 THEN t1 || ' {ban}'
                  ELSE t1 END AS text FROM sp_src2),
{_span_w2_cte("sp_docs")},
{_span_mine_multi_ctes(ns, min_df)},
{_span_rewrite_ctes()}
SELECT * FROM spanfinal
"""


def remove_listed_spans_sql(table: str = "documents") -> str:
    """dedup.remove_listed_spans mirrored on the planted fixture with
    the FROZEN list = the two planted phrases themselves (header +
    footer): per phrase, match starts where the lowercased word slice
    equals the phrase, expand to covered positions, then the SAME
    sp_ rewrite chain as the mined variant."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    phrases = [hdr, ftr]
    max_l = max(len(DD._phrase_tokens(p, "remove_listed_spans_sql"))
                for p in phrases)
    starts = []
    for ph in phrases:
        toks = DD._phrase_tokens(ph, "remove_listed_spans_sql")
        L = len(toks)
        lit = " ".join(toks).replace("'", "''")
        starts.append(
            f"SELECT id, i, {L} AS L FROM "
            f"(SELECT id, words, "
            f"unnest(generate_series(1, m - {L} + 1)) AS i "
            f"FROM sp_w2 WHERE m >= {L}) "
            f"WHERE lower(array_to_string("
            f"list_slice(words, i, i + {L - 1}), ' ')) = '{lit}'")
    starts_sql = " UNION ALL ".join(starts)
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS text FROM sp_src),
{_span_w2_cte("sp_docs")},
sp_cov AS (
  SELECT DISTINCT st.id, st.i - 1 + dd.d AS j
  FROM ({starts_sql}) st
  CROSS JOIN (SELECT unnest(generate_series(0, {max_l - 1})) AS d) dd
  WHERE dd.d < st.L),
{_span_rewrite_ctes()}
SELECT * FROM spanfinal
"""


def dedup_lines_sql(table: str = "documents") -> str:
    """dedup.dedup_lines mirrored on the planted nav-line fixture
    (dedup.synth_lines_expr): '\\n'-split lines, keep blanks (ASCII-
    space trim) and first exact occurrences (DuckDB list lambdas are
    1-indexed: list_position(lines, x) = i IS the first-occurrence
    test), re-join byte-identically — including the r13 default
    max_lines=100000 degenerate-page guard (docs with more lines pass
    through untouched), so the mirror carries the operator's FULL
    default contract even though no fixture page approaches it."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    nav = DD.LINE_NAV
    m = DD.LINE_NAV_MOD
    nl = "chr(10)"
    return f"""
WITH src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {m} = 0
              THEN '{nav}' || {nl} || text || {nl} || '{nav}'
                   || {nl} || {nl} || '{nav}'
              ELSE text || {nl} || '{nav}' END AS text
  FROM {table} WHERE text IS NOT NULL),
l AS (SELECT id, string_split(text, {nl}) AS lines FROM src),
k AS (SELECT id, lines,
             list_filter(lines, (x, i) -> trim(x) = ''
                         OR list_position(lines, x) = i) AS kept
      FROM l)
SELECT CAST(id AS BIGINT) AS id,
       CASE WHEN len(lines) > {DD.DEDUP_MAX_LINES}
            THEN array_to_string(lines, {nl})
            ELSE array_to_string(kept, {nl}) END AS text_clean,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(CASE WHEN len(lines) > {DD.DEDUP_MAX_LINES} THEN 0
                 ELSE len(lines) - len(kept) END AS BIGINT)
         AS n_lines_removed
FROM k
"""


def decontaminate_spans_sql(table: str = "documents",
                            min_ngram: int = 5) -> str:
    """dedup.decontaminate_spans mirrored on the planted-quote fixture
    (dedup.synth_quote_expr): the holdout's DISTINCT lowercased n-gram
    hashes, positional train hashes joined against them, covered
    positions, then the shared sp_ rewrite chain."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    n = int(min_ngram)
    q = DD.EVAL_QUOTE
    tm = DD.QUOTE_TRAIN_MOD
    th = H.duck_token_hash(
        f"lower(array_to_string(list_slice(words, i, i + {n - 1}), ' '))")
    return f"""
WITH pl AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 10 = 0 OR doc_id % {tm} = 1
              THEN text || ' {q}' ELSE text END AS text
  FROM {table} WHERE text IS NOT NULL),
tr AS (SELECT * FROM pl WHERE id % 10 <> 0),
ho AS (SELECT * FROM pl WHERE id % 10 = 0),
{_span_w2_cte("tr")},
hw AS (SELECT id, regexp_extract_all(text, '\\S+') AS words,
              len(regexp_extract_all(text, '\\S+')) AS m FROM ho),
hset AS (
  SELECT DISTINCT {th} % {P} AS sh
  FROM (SELECT id, words,
               unnest(generate_series(1, m - {n} + 1)) AS i
        FROM hw WHERE m >= {n})),
sp_ps AS (
  SELECT id, i - 1 AS i, {th} % {P} AS sh
  FROM (SELECT id, words,
               unnest(generate_series(1, m - {n} + 1)) AS i
        FROM sp_w2 WHERE m >= {n})),
sp_cov AS (
  SELECT DISTINCT p.id, p.i + d.d AS j
  FROM sp_ps p JOIN hset USING (sh)
  CROSS JOIN (SELECT unnest(generate_series(0, {n - 1})) AS d) d),
{_span_rewrite_ctes()}
SELECT * FROM spanfinal
"""


def boilerplate_ngrams_sql(table: str = "documents",
                           min_ngram: int = 5, min_df: int = 25,
                           k: int = 20) -> str:
    """dedup.boilerplate_ngrams mirrored on the span fixture: the
    top-k repeated n-grams AS STRINGS by distinct-doc frequency,
    deterministic ties (df desc, ngram asc)."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    n = int(min_ngram)
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS text FROM sp_src),
w AS (SELECT id, regexp_extract_all(text, '\\S+') AS words,
             len(regexp_extract_all(text, '\\S+')) AS m
      FROM sp_docs),
g AS (SELECT DISTINCT id,
        lower(array_to_string(list_slice(words, i, i + {n - 1}), ' '))
          AS ngram
      FROM (SELECT id, words,
                   unnest(generate_series(1, m - {n} + 1)) AS i
            FROM w WHERE m >= {n}))
SELECT ngram, CAST(count(*) AS BIGINT) AS df_docs
FROM g GROUP BY ngram HAVING count(*) >= {min_df}
ORDER BY df_docs DESC, ngram LIMIT {k}"""


def boilerplate_ngrams_multi_sql(table: str = "documents",
                                 min_ngram: int = 4, max_ngram: int = 7,
                                 min_df: int | dict = 25,
                                 k: int = 20) -> str:
    """dedup.boilerplate_ngrams(max_ngram=...) mirrored on the multi-n
    fixture: every length's repeated n-grams AS STRINGS ranked by
    (df desc, len desc, ngram asc). ``min_df`` may be the operator's
    per-length {n: df} dict (r13) — the threshold becomes a CASE on
    the carried length, exactly dedup._per_n_threshold."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr, ban = DD.SPAN_HEADER, DD.SPAN_FOOTER, DD.SPAN_SHORT
    hm, fm, sm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD, \
        DD.SPAN_SHORT_MOD
    ns_lit = ", ".join(str(x) for x in
                       range(int(min_ngram), int(max_ngram) + 1))
    thr = _duck_per_n_threshold(min_df)
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_src2 AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS t1 FROM sp_src),
sp_docs AS (
  SELECT id, CASE WHEN id % {sm} = 1 THEN t1 || ' {ban}'
                  ELSE t1 END AS text FROM sp_src2),
w AS (SELECT id, regexp_extract_all(text, '\\S+') AS words,
             len(regexp_extract_all(text, '\\S+')) AS m
      FROM sp_docs),
g AS (SELECT DISTINCT id, nn,
        lower(array_to_string(list_slice(words, i, i + nn - 1), ' '))
          AS ngram
      FROM (SELECT id, words, nn,
                   unnest(generate_series(1, m - nn + 1)) AS i
            FROM (SELECT id, words, m, unnest([{ns_lit}]) AS nn
                  FROM w)
            WHERE m >= nn))
SELECT ngram, CAST(nn AS INTEGER) AS ngram_len,
       CAST(count(*) AS BIGINT) AS df_docs
FROM g GROUP BY ngram, nn HAVING count(*) >= {thr}
ORDER BY df_docs DESC, ngram_len DESC, ngram LIMIT {k}"""


def span_removal_stats_sql(table: str = "documents",
                           min_ngram: int = 5,
                           min_df: int = 25) -> str:
    """dedup.span_removal_stats mirrored: one aggregate row over the
    spanfinal chain on the shared boilerplate fixture (aggregates in
    their own CTE because duck_sig6's mantissa subquery cannot wrap a
    raw aggregate)."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS text FROM sp_src),
{_span_ctes("sp_docs", int(min_ngram), int(min_df))},
agg AS (
  SELECT count(*) AS nd,
         count(*) FILTER (WHERE n_tokens_removed > 0) AS aff,
         sum(n_tokens) AS tok,
         sum(n_tokens_removed) AS rm,
         sum(n_spans_removed) AS sp
  FROM spanfinal)
SELECT CAST(nd AS BIGINT) AS n_docs,
       CAST(aff AS BIGINT) AS n_docs_affected,
       {duck_sig6("CAST(aff AS DOUBLE) / CAST(nd AS DOUBLE)")}
         AS affected_doc_fraction,
       CAST(tok AS BIGINT) AS n_tokens,
       CAST(rm AS BIGINT) AS n_tokens_removed,
       {duck_sig6("CAST(rm AS DOUBLE) / CAST(tok AS DOUBLE)")}
         AS removed_token_fraction,
       CAST(sp AS BIGINT) AS n_spans_removed
FROM agg
"""


def boilerplate_by_source_sql(table: str = "documents",
                              min_ngram: int = 5, min_df: int = 25,
                              k: int = 20) -> str:
    """dedup.boilerplate_by_source mirrored: the corpus-level top-k
    (boilerplate_ngrams' exact contract, ALL text docs) joined to
    per-source doc frequencies (NULL sources excluded), on the span
    fixture with the fixture's own source column carried through."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    n = int(min_ngram)
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id, source,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, source, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                          ELSE t0 END AS text FROM sp_src),
w AS (SELECT id, source, regexp_extract_all(text, '\\S+') AS words,
             len(regexp_extract_all(text, '\\S+')) AS m
      FROM sp_docs),
g AS (SELECT DISTINCT id, source,
        lower(array_to_string(list_slice(words, i, i + {n - 1}), ' '))
          AS ngram
      FROM (SELECT id, source, words,
               unnest(generate_series(1, m - {n} + 1)) AS i
            FROM w WHERE m >= {n})),
top AS (
  SELECT ngram FROM (
    SELECT ngram, count(DISTINCT id) AS dfd FROM g GROUP BY ngram
    HAVING count(DISTINCT id) >= {min_df})
  ORDER BY dfd DESC, ngram LIMIT {k})
SELECT g.ngram, g.source, CAST(count(DISTINCT g.id) AS BIGINT)
         AS df_docs
FROM g JOIN top USING (ngram)
WHERE g.source IS NOT NULL
GROUP BY g.ngram, g.source"""


def ngram_df_histogram_sql(table: str = "documents",
                           min_ngram: int = 5) -> str:
    """dedup.ngram_df_histogram mirrored on the span fixture: log2
    document-frequency buckets over the distinct (id, hash) n-gram
    frame, DF-1 excluded."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    n = int(min_ngram)
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    th = H.duck_token_hash(
        f"lower(array_to_string(list_slice(words, i, i + {n - 1}), ' '))")
    return f"""
WITH sp_src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % {hm} <> {hm - 1}
              THEN '{hdr} ' || text ELSE text END AS t0
  FROM {table} WHERE text IS NOT NULL),
sp_docs AS (
  SELECT id, CASE WHEN id % {fm} = 0 THEN t0 || '  {ftr}'
                  ELSE t0 END AS text FROM sp_src),
w AS (SELECT id, regexp_extract_all(text, '\\S+') AS words,
             len(regexp_extract_all(text, '\\S+')) AS m
      FROM sp_docs),
dfc AS (
  SELECT sh, count(*) AS dfd FROM (
    SELECT DISTINCT id, {th} % {P} AS sh
    FROM (SELECT id, words,
                 unnest(generate_series(1, m - {n} + 1)) AS i
          FROM w WHERE m >= {n}))
  GROUP BY sh HAVING count(*) >= 2)
SELECT CAST(pow(2.0, b) AS BIGINT) AS bucket_min_df,
       CAST(pow(2.0, b + 1) AS BIGINT) - 1 AS bucket_max_df,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(sum(dfd) AS BIGINT) AS n_doc_ngrams
FROM (SELECT dfd, CAST(floor(log2(dfd)) AS INTEGER) AS b FROM dfc)
GROUP BY b"""


def duplicated_ngram_fraction_sql(table: str = "documents") -> str:
    """Mirror of dedup.duplicated_ngram_fraction."""
    return f"""
WITH {_tokens_cte(table)}, {_shingle_hash_cte()},
expl AS (SELECT DISTINCT id, unnest(hashes) AS shingle FROM sh),
df AS (SELECT shingle, count(*) AS df_docs FROM expl GROUP BY shingle)
SELECT CAST(e.id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       avg(CASE WHEN df.df_docs > 1 THEN 1.0 ELSE 0.0 END) AS dup_fraction
FROM expl e JOIN df ON df.shingle = e.shingle
GROUP BY e.id
"""


_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
        "i -> {a}[i] * {b}[i]), (x, y) -> x + y)")


def _norm_cte(table: str = "embeddings") -> str:
    dot_self = _DOT.format(a="v", b="v")
    return (f"n AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, "
            f"sqrt({dot_self}) AS norm "
            f"FROM (SELECT vec_id, embedding FROM {table}))")


def ann_brute_force_sql(table: str = "embeddings", k: int = 5,
                        max_query_id: int = 10) -> str:
    dot = _DOT.format(a="q.v", b="c.v")
    return f"""
WITH {_norm_cte(table)},
q AS (SELECT * FROM n WHERE id < {max_query_id}),
scored AS (SELECT q.id AS query_id, c.id AS neighbor_id,
                  ({dot}) / (q.norm * c.norm) AS cos
           FROM n c CROSS JOIN q WHERE c.id != q.id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def embedding_neardup_sql(table: str = "embeddings",
                          threshold: float = 0.95) -> str:
    dot = _DOT.format(a="a.v", b="b.v")
    return f"""
WITH {_norm_cte(table)}
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       ({dot}) / (a.norm * b.norm) AS cos
FROM n a JOIN n b ON a.id < b.id
WHERE ({dot}) / (a.norm * b.norm) >= {threshold}
"""


def embedding_neardup_lsh_sql(table: str = "embeddings",
                              threshold: float = 0.95, n_tables: int = 8,
                              bits_per_table: int = 8,
                              dim: int = 64) -> str:
    """Mirror of dedup.embedding_near_dup_pairs_lsh: same deterministic
    banded tables, DISTINCT candidate pairs from any-table collision, exact
    left-fold cosine recheck."""
    from flink_descriptive_stats_spark.operators.similarity import (
        _hp_component)
    code_terms = []
    for t in range(n_tables):
        terms = []
        for j in range(bits_per_table):
            hp = [_hp_component(t * bits_per_table + j, i)
                  for i in range(dim)]
            arr = "[" + ", ".join(repr(c) for c in hp) + "]"
            dot = _DOT.format(a="v", b=f"({arr}::DOUBLE[])")
            terms.append(
                f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
        code_terms.append(" + ".join(terms))
    band_rows = " UNION ALL ".join(
        f"SELECT id, {t} AS tbl, ({code_terms[t]}) AS bucket FROM n"
        for t in range(n_tables))
    dot_ab = _DOT.format(a="a.v", b="b.v")
    return f"""
WITH {_norm_cte(table)},
bands AS ({band_rows}),
cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         FROM bands x JOIN bands y
         ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id < y.id)
SELECT CAST(cand.id_a AS BIGINT) AS id_a, CAST(cand.id_b AS BIGINT) AS id_b,
       ({dot_ab}) / (a.norm * b.norm) AS cos
FROM cand JOIN n a ON a.id = cand.id_a JOIN n b ON b.id = cand.id_b
WHERE ({dot_ab}) / (a.norm * b.norm) >= {threshold}
"""


def rolling_stats_sql(table: str = "events",
                      window_seconds: int = 3600) -> str:
    """Mirror of extras.rolling_stats: trailing RANGE window keyed by
    user over epoch-micros event time."""
    # windowed aggregates live in the inner subquery: duck_sig6 expands to
    # a correlated scalar subquery, and window refs cannot cross into it
    return f"""
SELECT user_id, ts, value,
       CAST(roll_n AS BIGINT) AS roll_n,
       {duck_sig6('rm')} AS roll_mean,
       roll_min, roll_max
FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(value AS DOUBLE) AS value,
             count(CAST(value AS DOUBLE)) OVER w AS roll_n,
             avg(CAST(value AS DOUBLE)) OVER w AS rm,
             min(CAST(value AS DOUBLE)) OVER w AS roll_min,
             max(CAST(value AS DOUBLE)) OVER w AS roll_max
      FROM {table}
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                   RANGE BETWEEN {window_seconds * 1_000_000} PRECEDING
                   AND CURRENT ROW))
"""


def grouped_zscore_sql(table: str = "events", z: float = 3.0) -> str:
    """Mirror of extras.grouped_zscore_outliers: keep/drop fence applied
    to the sig6-rounded score on both sides."""
    # alias must not be "e": duck_sig6's expansion defines its own column e
    score = duck_sig6("(CAST(ev.value AS DOUBLE) - s.mu) / s.sd")
    return f"""
WITH s AS (SELECT event_type, avg(CAST(value AS DOUBLE)) AS mu,
                  stddev_pop(CAST(value AS DOUBLE)) AS sd
           FROM {table} GROUP BY event_type)
SELECT ev.event_type, CAST(ev.value AS DOUBLE) AS value,
       {score} AS zscore
FROM {table} ev JOIN s USING (event_type)
WHERE s.sd > 0 AND abs(CAST({score} AS DOUBLE)) > {z}
"""


def distinct_row_stats_sql(table: str = "documents",
                           columns: tuple[str, ...] = ()) -> str:
    """Mirror of extras.distinct_row_stats."""
    from flink_descriptive_stats_spark.oracle import TABLE_SCHEMAS
    cols = list(columns) or [c for c, _ in TABLE_SCHEMAS[table]]
    tup = ", ".join(cols)
    return (f"SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(DISTINCT ({tup})) AS BIGINT) AS distinct_rows, "
            f"CAST(count(*) - count(DISTINCT ({tup})) AS BIGINT) "
            f"AS duplicate_rows FROM {table}")


def grouped_topk_tokens_sql(table: str = "documents",
                            key_col: str = "lang", k: int = 5) -> str:
    """Mirror of topk.grouped_topk_tokens."""
    return f"""
WITH tok AS (SELECT {key_col} AS key, unnest({H.duck_tokens('text')}) AS token
             FROM {table}
             WHERE text IS NOT NULL AND {key_col} IS NOT NULL),
c AS (SELECT key, token, count(*) AS cnt FROM tok GROUP BY key, token)
SELECT key, token, CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (PARTITION BY key
            ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
FROM c
QUALIFY rank <= {k}
"""


def json_profile_sql(table: str = "events",
                     json_col: str = "props") -> str:
    """Mirror of extras.json_profile via JSON -> MAP(VARCHAR, VARCHAR)
    cast + map_entries unnest — no JSON-path string building, so keys
    containing quotes/backslashes cannot break the query. Verified
    equivalences with Spark's from_json(map<string,string>): malformed or
    non-object JSON -> NULL map -> row dropped (TRY_CAST x2); duplicate
    keys KEPT as separate entries on both engines; string values
    unquoted; numeric stats via TRY_CAST on both sides."""
    v = "TRY_CAST(value AS DOUBLE)"
    return f"""
WITH m AS (SELECT TRY_CAST(TRY_CAST({json_col} AS JSON)
                           AS MAP(VARCHAR, VARCHAR)) AS mp
           FROM {table} WHERE {json_col} IS NOT NULL),
kv AS (SELECT unnest(map_entries(mp), recursive := true)
       FROM m WHERE mp IS NOT NULL)
SELECT key,
       CAST(count(*) AS BIGINT) AS present,
       CAST(count({v}) AS BIGINT) AS numeric_n,
       min({v}) AS min_val,
       max({v}) AS max_val,
       {duck_sig6(f'avg({v})')} AS mean_val
FROM kv
GROUP BY key
"""


def windowed_distinct_sql(table: str = "events", ts_col: str = "ts",
                          key_col: str = "user_id",
                          window_hours: int = 24) -> str:
    """Mirror of profile_stream.windowed_distinct (exact batch path):
    Spark's window() and DuckDB's time_bucket both align whole-hour
    durations to the epoch."""
    return f"""
SELECT time_bucket(INTERVAL '{window_hours} hours',
                   CAST({ts_col} AS TIMESTAMP)) AS window_start,
       time_bucket(INTERVAL '{window_hours} hours',
                   CAST({ts_col} AS TIMESTAMP))
       + INTERVAL '{window_hours} hours' AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {key_col}) AS BIGINT) AS distinct_keys
FROM {table}
WHERE {ts_col} IS NOT NULL
GROUP BY 1, 2
"""


def grouped_quantiles_sql(table: str = "events",
                          key_col: str = "event_type",
                          value_col: str = "value",
                          probs=(0.25, 0.5, 0.75)) -> str:
    """Mirror of extras.grouped_quantiles (exact path)."""
    qs = ", ".join(
        f"{duck_sig6(f'quantile_cont(CAST({value_col} AS DOUBLE), {p})')} "
        f"AS q_{int(p * 100)}" for p in probs)
    return (f"SELECT {key_col}, {qs} FROM {table} "
            f"GROUP BY {key_col}")


def sessionize_sql(table: str = "events", gap_minutes: int = 30) -> str:
    """Gaps-and-islands mirror of pipeline_stream.sessionize. Boundary
    semantics verified against Spark's session_window: events exactly
    ``gap`` apart MERGE (a new session starts only when the inter-event
    gap is strictly greater)."""
    g = f"INTERVAL '{gap_minutes} minutes'"
    dur = "epoch(max(t) + {g}) - epoch(min(t))".format(g=g)
    return f"""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
                  CAST(value AS DOUBLE) AS x FROM {table}),
l AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
s AS (SELECT *, CASE WHEN pt IS NULL OR t - pt > {g} THEN 1 ELSE 0 END AS ns
      FROM l),
gi AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS sid FROM s)
SELECT CAST(user_id AS BIGINT) AS user_id,
       min(t) AS session_start,
       max(t) + {g} AS session_end,
       {duck_sig6(dur)} AS duration_s,
       CAST(count(*) AS BIGINT) AS n_events,
       min(x) AS min_val, max(x) AS max_val,
       {duck_sig6('avg(x)')} AS mean_val
FROM gi GROUP BY user_id, sid
"""


def decontaminate_exact_sql(table: str = "documents",
                            mod: int = 10) -> str:
    """Mirror of dedup.decontaminate (exact): train = doc_id % mod != 0,
    holdout = doc_id % mod == 0. NOT EXISTS (not NOT IN): a NULL text row
    in the holdout would make NULL-unsafe NOT IN return zero rows, while
    Spark's anti-join treats NULL keys as non-matching."""
    return (f"SELECT t.* FROM {table} t WHERE doc_id % {mod} != 0 "
            f"AND NOT EXISTS (SELECT 1 FROM {table} h "
            f"WHERE h.doc_id % {mod} = 0 AND md5(h.text) = md5(t.text))")


def decontaminate_fuzzy_sql(table: str = "documents",
                            mod: int = 10) -> str:
    """Mirror of dedup.decontaminate (fuzzy): anti-join on LSH band keys."""
    sig_cols = ", ".join(f"{_sig_expr(j)} AS sig_{j}"
                         for j in range(H.MINHASH_K))
    band_rows = []
    for b in range(H.LSH_BANDS):
        key = " || ',' || ".join(
            f"CAST(sig_{b * H.LSH_ROWS + r} AS VARCHAR)"
            for r in range(H.LSH_ROWS))
        band_rows.append(f"SELECT id, {b} AS band, {key} AS band_key FROM sw")
    return f"""
WITH {_tokens_cte(table)}, {_shingle_hash_cte()},
sw AS (SELECT id, {sig_cols} FROM sh),
bands AS ({' UNION ALL '.join(band_rows)}),
hb AS (SELECT DISTINCT band, band_key FROM bands
       WHERE id % {mod} = 0),
contaminated AS (SELECT DISTINCT b.id FROM bands b
                 JOIN hb ON b.band = hb.band AND b.band_key = hb.band_key
                 WHERE b.id % {mod} != 0)
SELECT t.* FROM {table} t
WHERE doc_id % {mod} != 0 AND doc_id NOT IN (SELECT id FROM contaminated)
"""


def corpus_summary_sql(table: str = "documents") -> str:
    """Mirror of text.corpus_summary grouped by (lang, source)."""
    return (f"WITH s AS ({text_stats_sql(table)}), "
            f"d AS (SELECT doc_id AS id, lang, source FROM {table}) "
            f"SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
            f"CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
            f"CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            f"{duck_sig6('avg(CAST(quality_score AS DOUBLE))')} "
            f"AS mean_quality "
            f"FROM d JOIN s USING (id) GROUP BY lang, source")


def quality_filter_sql(table: str = "documents",
                       min_score: float = 0.5) -> str:
    """Mirror of text.quality_filter: semi-join on the sig6-round-tripped
    quality score."""
    return (f"SELECT d.* FROM {table} d WHERE d.doc_id IN "
            f"(SELECT id FROM ({text_stats_sql(table)}) "
            f"WHERE CAST(quality_score AS DOUBLE) >= {min_score})")


def embedding_dim_profile_sql(table: str = "embeddings") -> str:
    """Mirror of similarity.embedding_dim_profile (0-based dims)."""
    return f"""
WITH e AS (SELECT CAST(i - 1 AS INTEGER) AS dim, embedding[i]::DOUBLE AS x
           FROM {table}, unnest(generate_series(1, len(embedding))) AS t(i)
           WHERE embedding IS NOT NULL)
SELECT dim, CAST(count(x) AS BIGINT) AS n,
       {duck_sig6('avg(x)')} AS mean,
       {duck_sig6('stddev_pop(x)')} AS stddev_pop,
       min(x) AS min_val, max(x) AS max_val
FROM e GROUP BY dim
"""


def _stop_filter(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, x -> x IN ({lst})))"


def text_stats_sql(table: str = "documents") -> str:
    punct = f"len(regexp_extract_all(text, '{TX.PUNCT_RE}'))"
    upper = f"len(regexp_extract_all(text, '{TX.UPPER_RE}'))"
    digit = f"len(regexp_extract_all(text, '{TX.DIGIT_RE}'))"
    ws_tok = "len(regexp_extract_all(text, '\\S+'))"
    subw = f"len(regexp_extract_all(text, '{TX.SUBWORD_RE}'))"
    stop = _stop_filter(TX.STOPWORDS["en"])
    return f"""
WITH {_tokens_cte(table)},
m AS (SELECT id, length(text) AS n_chars, len(toks) AS n_tok,
             {punct} AS punct, {upper} AS upper_c, {digit} AS digit_c,
             {ws_tok} AS ws_tok, {subw} AS subw, {stop} AS stop_hits,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, t -> length(t)))
                    AS DOUBLE) / CAST(len(toks) AS DOUBLE)
             ELSE 0.0 END AS avg_tok_len,
             CASE WHEN length(text) > 0 THEN
               CAST({punct} AS DOUBLE) / CAST(length(text) AS DOUBLE)
             ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0 THEN
               CAST({stop} AS DOUBLE) / CAST(len(toks) AS DOUBLE)
             ELSE 0.0 END AS stop_ratio
      FROM t),
qf AS (SELECT *,
              0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
              + 0.3 * (1.0 - least(punct_ratio * 5.0, 1.0))
              + 0.3 * least(stop_ratio * 4.0, 1.0) AS quality
       FROM m)
SELECT CAST(id AS BIGINT) AS id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tok AS BIGINT) AS n_tokens, CAST(ws_tok AS BIGINT) AS n_ws_tokens,
       CAST(subw AS BIGINT) AS n_subword_tokens,
       CAST(punct AS BIGINT) AS n_punct, CAST(upper_c AS BIGINT) AS n_upper,
       CAST(digit_c AS BIGINT) AS n_digit,
       CAST(stop_hits AS BIGINT) AS n_stopwords,
       {duck_sig6('avg_tok_len')} AS avg_token_len,
       {duck_sig6('punct_ratio')} AS punct_ratio,
       {duck_sig6('quality')} AS quality_score
FROM qf
"""


def lang_id_sql(table: str = "documents") -> str:
    scores = {lang: _stop_filter(words)
              for lang, words in TX.STOPWORDS.items()}
    scores["zh"] = f"len(regexp_extract_all(text, '{TX.CJK_RE}'))"
    score_cols = ", ".join(f"{scores[lang]} AS s_{lang}"
                           for lang in TX.LANG_ORDER)
    whens = []
    for lang in TX.LANG_ORDER[:-1]:
        cond = " AND ".join(f"s_{lang} >= s_{other}"
                            for other in TX.LANG_ORDER if other != lang)
        whens.append(f"WHEN {cond} THEN '{lang}'")
    pred = f"CASE {' '.join(whens)} ELSE '{TX.LANG_ORDER[-1]}' END"
    sel = ", ".join(f"CAST(s_{lang} AS BIGINT) AS score_{lang}"
                    for lang in TX.LANG_ORDER)
    return (f"WITH {_tokens_cte(table)}, "
            f"m AS (SELECT id, {score_cols} FROM t)\n"
            f"SELECT CAST(id AS BIGINT) AS id, {sel}, "
            f"{pred} AS predicted_lang FROM m")


def fingerprints_sql(table: str = "documents") -> str:
    th = H.duck_token_hash("t")
    return (f"WITH {_tokens_cte(table)}\n"
            f"SELECT CAST(id AS BIGINT) AS id, "
            f"md5(array_to_string(list_sort(list_distinct(toks)), ' ')) "
            f"AS bag_fingerprint, "
            f"CAST(list_reduce([CAST(7 AS BIGINT)] || "
            f"list_transform(toks, t -> {th} % {P}), "
            f"(acc, h) -> (acc * 131 + h) % {P}) AS BIGINT) "
            f"AS seq_fingerprint FROM t")


def hash_split_sql(table: str = "documents",
                   weights: tuple = (("train", 0.8), ("val", 0.1),
                                     ("test", 0.1)),
                   salt: str = "split") -> str:
    """Mirror of sampling.hash_split — thresholds come from the same
    ``split_thresholds`` helper the Spark side uses (shared Python ints)."""
    from flink_descriptive_stats_spark.operators import sampling as SP
    bucket = (H.duck_token_hash(f"CAST(doc_id AS VARCHAR) || '/{salt}'")
              + f" % {SP.BUCKETS}")
    cases = "".join(f"WHEN {bucket} < {thr} THEN '{name}' "
                    for thr, name in SP.split_thresholds(weights))
    return (f"SELECT *, CASE {cases}ELSE '{weights[-1][0]}' END AS split "
            f"FROM {table}")


def mixture_sample_sql(table: str = "documents",
                       rates: tuple = (), default_rate: float = 1.0,
                       salt: str = "mix") -> str:
    """Mirror of sampling.mixture_sample (CASE on source -> int threshold)."""
    from flink_descriptive_stats_spark.operators import sampling as SP
    bucket = (H.duck_token_hash(f"CAST(doc_id AS VARCHAR) || '/{salt}'")
              + f" % {SP.BUCKETS}")
    cases = "".join(f"WHEN source = '{name}' THEN {int(r * SP.BUCKETS)} "
                    for name, r in rates)
    thr = (f"CASE {cases}ELSE {int(default_rate * SP.BUCKETS)} END"
           if rates else str(int(default_rate * SP.BUCKETS)))
    return f"SELECT * FROM {table} WHERE {bucket} < ({thr})"


def temperature_mixture_sql(table: str = "documents", alpha: float = 0.5,
                            target_fraction: float = 0.5,
                            salt: str = "tmix",
                            weight_sql: str | None = None) -> str:
    """Mirror of sampling.temperature_mixture_sample: same bounded
    per-source counts, the identical left-to-right rate arithmetic, the
    sig6 round BEFORE the floor-to-threshold (so pow/division last-ulp
    differences cannot flip the discrete keep decision), and the shared
    md5 bucket rule. ``weight_sql`` mirrors weight_col (r13): per-source
    mass = sum(weight) as DOUBLE (exact for integer token counts),
    NULL-weight rows out of scope on both the mass and the output."""
    from flink_descriptive_stats_spark.operators import sampling as SP
    bucket = (H.duck_token_hash(f"CAST(doc_id AS VARCHAR) || '/{salt}'")
              + f" % {SP.BUCKETS}")
    raw = (f"{float(target_fraction)!r} * tn * p / tp "
           f"/ CAST(n AS DOUBLE)")
    if weight_sql is None:
        mass, scope, out_scope = "count(*)", "source IS NOT NULL", ""
    else:
        assert weight_sql.isidentifier(), weight_sql  # a column name
        mass = f"sum(CAST({weight_sql} AS DOUBLE))"
        scope = f"source IS NOT NULL AND {weight_sql} IS NOT NULL"
        out_scope = f" AND x.{weight_sql} IS NOT NULL"
    return f"""
WITH c AS (SELECT source AS s, {mass} AS n FROM {table}
           WHERE {scope} GROUP BY 1),
r AS (SELECT s, n, pow(CAST(n AS DOUBLE), {float(alpha)!r}) AS p,
             sum(pow(CAST(n AS DOUBLE), {float(alpha)!r})) OVER () AS tp,
             CAST(sum(n) OVER () AS DOUBLE) AS tn
      FROM c),
t AS (SELECT s, CAST(floor(least(1.0,
             CAST({duck_sig6(raw)} AS DOUBLE)) * {SP.BUCKETS}.0)
             AS BIGINT) AS thr
      FROM r)
SELECT x.* FROM {table} x JOIN t ON x.source = t.s
WHERE {bucket} < t.thr{out_scope}"""


def pack_sequences_sql(table: str = "documents", max_tokens: int = 512,
                       n_shards: int = 8) -> str:
    """Mirror of sampling.pack_sequences (per-shard running token offsets)."""
    return f"""
WITH base AS (
  SELECT doc_id AS id, CAST(doc_id % {n_shards} AS BIGINT) AS shard,
         CAST(len({H.duck_tokens('text')}) AS BIGINT) AS n_tokens
  FROM {table} WHERE text IS NOT NULL),
w AS (
  SELECT id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS start_offset
  FROM base)
SELECT id, shard, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {max_tokens} AS BIGINT) AS pack_id
FROM w
"""


def _bfd_ctes(table: str, cap: int, n_shards: int,
              raw_sql: str | None = None) -> str:
    """Best-fit-decreasing REPLAYED literally (r12): a recursive CTE
    walks each shard's (size desc, id asc) order carrying the
    remaining-capacity list as bin state;
    list_min(list_filter(rem, x -> x >= size)) is the tightest
    fitting bin and list_position takes its FIRST occurrence
    (= lowest pack_id on ties), exactly the Spark applyInPandas loop.
    Each recursive row also carries the processed item's (id,
    pack_id, nt), so the chain yields BOTH the per-doc assignment
    (rk > 0 rows) and the final bin state (max-rk row per shard).
    ``raw_sql`` (r13) swaps the whitespace-token budget for any
    per-doc count expression — the tokenizer-true path's mirror
    (sampling._bfd_narrow n_tokens_col); NULL budgets are out of
    scope exactly like the Spark side."""
    toks = H.duck_tokens("text")
    raw = raw_sql if raw_sql is not None else f"len({toks})"
    return f"""d AS (
  SELECT doc_id AS id, doc_id % {n_shards} AS shard,
         least({raw}, {cap}) AS nt,
         {raw} AS raw
  FROM {table}
  WHERE ({raw}) IS NOT NULL AND ({raw}) > 0),
ranked AS (
  SELECT shard, id, nt,
         row_number() OVER (PARTITION BY shard
                            ORDER BY nt DESC, id ASC) AS rk
  FROM d),
bfd AS (
  SELECT shard, 0 AS rk, CAST([] AS BIGINT[]) AS rem,
         CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS pack_id,
         CAST(NULL AS BIGINT) AS nt
  FROM (SELECT DISTINCT shard FROM ranked)
  UNION ALL
  SELECT shard, rk,
         CASE WHEN best IS NULL THEN list_append(rem, {cap} - nt)
              ELSE rem[1:pos - 1] || [best - nt]
                   || rem[pos + 1:len(rem)]
         END AS rem,
         id,
         CASE WHEN best IS NULL THEN len(rem)
              ELSE pos - 1 END AS pack_id,
         nt
  FROM (SELECT r.shard AS shard, r.rk AS rk, r.nt AS nt, r.id AS id,
               b.rem AS rem,
               list_min(list_filter(b.rem, x -> x >= r.nt)) AS best,
               list_position(b.rem,
                 list_min(list_filter(b.rem, x -> x >= r.nt))) AS pos
        FROM bfd b JOIN ranked r
          ON r.shard = b.shard AND r.rk = b.rk + 1))"""


def pack_sequences_bfd_sql(table: str = "documents",
                           max_tokens: int = 512,
                           n_shards: int = 8) -> str:
    """Mirror of sampling.pack_sequences_bfd — the per-doc (id, shard,
    pack_id, n_tokens) assignment straight off the recursive BFD
    replay (see _bfd_ctes)."""
    return f"""
WITH RECURSIVE {_bfd_ctes(table, int(max_tokens), int(n_shards))}
SELECT CAST(id AS BIGINT) AS id, CAST(shard AS BIGINT) AS shard,
       CAST(pack_id AS BIGINT) AS pack_id,
       CAST(nt AS BIGINT) AS n_tokens
FROM bfd WHERE rk > 0
"""


def pack_stats_bfd_sql(table: str = "documents", max_tokens: int = 512,
                       n_shards: int = 8,
                       raw_sql: str | None = None) -> str:
    """Mirror of sampling.pack_stats_bfd — final per-shard bin states
    from the recursive BFD replay (_bfd_ctes) become pack fills; the
    summary aggregates them (mean through the shared sig6 rendering,
    aggregated in a CTE first because duck_sig6 cannot wrap a raw
    aggregate). ``raw_sql`` mirrors n_tokens_col (see _bfd_ctes)."""
    cap = int(max_tokens)
    return f"""
WITH RECURSIVE {_bfd_ctes(table, cap, int(n_shards), raw_sql)},
fin AS (
  SELECT shard, rem
  FROM (SELECT shard, rem, rk,
               max(rk) OVER (PARTITION BY shard) AS mx FROM bfd)
  WHERE rk = mx),
fills AS (SELECT shard, {cap} - unnest(rem) AS fill FROM fin),
agg AS (SELECT count(*) AS np, avg(CAST(fill AS DOUBLE)) AS mf,
               max(fill) AS xf, min(fill) AS nf
        FROM fills),
ov AS (SELECT count(*) AS nd,
              count(*) FILTER (WHERE raw > {cap}) AS nov
       FROM d)
SELECT CAST(np AS BIGINT) AS n_packs,
       CAST(nd AS BIGINT) AS n_docs,
       CAST(nov AS BIGINT) AS n_overflow,
       {duck_sig6("mf")} AS mean_fill,
       CAST(xf AS BIGINT) AS max_fill,
       CAST(nf AS BIGINT) AS min_fill
FROM agg, ov
"""


#: the r13 tokenizer-true budget fixture: a deterministic chars-per-token
#: estimate (floor(len/4)+1 — the ~4-chars/token heuristic) standing in
#: for a real tokenizer's per-doc counts, floor'd EXPLICITLY on both
#: sides because Spark truncates double->bigint casts while DuckDB
#: rounds. The Spark query materializes the same formula as a column and
#: packs with n_tokens_col, so the gate proves the precomputed-budget
#: plumbing end to end.
BFD_TOKENS_RAW_SQL = "CAST(floor(length(text) / 4) AS BIGINT) + 1"


def pack_stats_bfd_tokens_sql(table: str = "documents",
                              max_tokens: int = 512,
                              n_shards: int = 8) -> str:
    """Mirror of sampling.pack_stats_bfd(n_tokens_col=...) on the
    chars-per-token estimate column (BFD_TOKENS_RAW_SQL)."""
    return pack_stats_bfd_sql(table, max_tokens, n_shards,
                              raw_sql=BFD_TOKENS_RAW_SQL)


def ivf_topk_sql(table: str = "embeddings", k: int = 5, n_cells: int = 16,
                 n_probe: int = 4, max_query_id: int = 10) -> str:
    """Mirror of similarity.ivf_topk (seed-vector coarse quantizer)."""
    cdot = _DOT.format(a="n.v", b="cent.cv")
    qdot = _DOT.format(a="p.qv", b="a.v")
    return f"""
WITH {_norm_cte(table)},
cent AS (SELECT id AS cell_id, v AS cv, norm AS cnorm FROM n
         WHERE id < {n_cells}),
sc AS (SELECT n.id, n.v, n.norm, cent.cell_id,
              ({cdot}) / (n.norm * cent.cnorm) AS cos_c,
              row_number() OVER (PARTITION BY n.id
                ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC,
                         cent.cell_id ASC) AS crank
       FROM n CROSS JOIN cent),
a AS (SELECT id, v, norm, cell_id FROM sc WHERE crank = 1),
p AS (SELECT id AS query_id, v AS qv, norm AS qnorm, cell_id FROM sc
      WHERE id < {max_query_id} AND crank <= {n_probe}),
cand AS (SELECT p.query_id, a.id AS neighbor_id,
                ({qdot}) / (p.qnorm * a.norm) AS cos
         FROM a JOIN p USING (cell_id) WHERE a.id != p.query_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM cand
QUALIFY rank <= {k}
"""


def ivf_kmeans_topk_sql(table: str = "embeddings", k: int = 5,
                        n_cells: int = 16, n_probe: int = 4,
                        max_query_id: int = 10, iters: int = 2,
                        dim: int = 64) -> str:
    """Mirror of similarity.ivf_topk(refine_iters=iters): the Lloyd loop
    unrolled as one CTE chain per iteration (assign -> per-dim mean ->
    regroup). Per-dim means round-trip through sig6 on BOTH sides — the
    loop's argmax is discrete, so ULP-level summation-order noise must be
    rounded away before it can fork the trajectory."""
    parts = [_norm_cte(table),
             f"cent0 AS (SELECT id AS cell_id, v AS cv, norm AS cnorm "
             f"FROM n WHERE id < {n_cells})"]
    for i in range(iters):
        cdot = _DOT.format(a="n.v", b="c.cv")
        parts.append(
            f"sc{i} AS (SELECT n.id, n.v, n.norm, c.cell_id, "
            f"row_number() OVER (PARTITION BY n.id "
            f"ORDER BY ({cdot}) / (n.norm * c.cnorm) DESC, c.cell_id ASC) "
            f"AS crank FROM n CROSS JOIN cent{i} c)")
        parts.append(f"a{i} AS (SELECT cell_id, v FROM sc{i} "
                     f"WHERE crank = 1)")
        mean_r = duck_sig6("avg(v[u.i])")
        parts.append(
            f"pd{i} AS (SELECT cell_id, u.i AS dim, "
            f"CAST({mean_r} AS DOUBLE) AS m FROM a{i} CROSS JOIN "
            f"(SELECT unnest(generate_series(1, {dim})) AS i) u "
            f"GROUP BY cell_id, u.i)")
        cvdot = _DOT.format(a="cv", b="cv")
        parts.append(
            f"cent{i + 1} AS (SELECT cell_id, cv, sqrt({cvdot}) AS cnorm "
            f"FROM (SELECT cell_id, list(m ORDER BY dim) AS cv "
            f"FROM pd{i} GROUP BY cell_id))")
    cdot = _DOT.format(a="n.v", b="cent.cv")
    qdot = _DOT.format(a="p.qv", b="a.v")
    parts.append(
        f"cent AS (SELECT * FROM cent{iters})")
    parts.append(
        f"sc AS (SELECT n.id, n.v, n.norm, cent.cell_id, "
        f"({cdot}) / (n.norm * cent.cnorm) AS cos_c, "
        f"row_number() OVER (PARTITION BY n.id "
        f"ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC, "
        f"cent.cell_id ASC) AS crank FROM n CROSS JOIN cent)")
    parts.append("a AS (SELECT id, v, norm, cell_id FROM sc WHERE crank = 1)")
    parts.append(
        f"p AS (SELECT id AS query_id, v AS qv, norm AS qnorm, cell_id "
        f"FROM sc WHERE id < {max_query_id} AND crank <= {n_probe})")
    parts.append(
        f"cand AS (SELECT p.query_id, a.id AS neighbor_id, "
        f"({qdot}) / (p.qnorm * a.norm) AS cos "
        f"FROM a JOIN p USING (cell_id) WHERE a.id != p.query_id)")
    return (f"WITH {', '.join(parts)} "
            f"SELECT CAST(query_id AS BIGINT) AS query_id, "
            f"CAST(neighbor_id AS BIGINT) AS neighbor_id, cos, "
            f"CAST(row_number() OVER (PARTITION BY query_id "
            f"ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank "
            f"FROM cand QUALIFY rank <= {k}")


def repetition_stats_sql(table: str = "documents") -> str:
    """Mirror of text.repetition_stats (Gopher-style repetition signals):
    multiset unigram/bigram hash counts — NOT list_distinct, repetition is
    the point — with exact integer-ratio outputs."""
    th = H.duck_token_hash("s")
    sh1 = H.duck_shingles("toks", 1)
    sh2 = H.duck_shingles("toks", 2)
    return f"""
WITH {_tokens_cte(table)},
u AS (SELECT id, unnest(list_transform({sh1}, s -> {th} % {P})) AS h FROM t),
uc AS (SELECT id, h, count(*) AS c FROM u GROUP BY id, h),
us AS (SELECT id, sum(c) AS n_tokens, count(*) AS n_distinct
       FROM uc GROUP BY id),
b AS (SELECT id, unnest(list_transform({sh2}, s -> {th} % {P})) AS h FROM t),
bc AS (SELECT id, h, count(*) AS c FROM b GROUP BY id, h),
bs AS (SELECT id, sum(c) AS n_bigrams, max(c) AS top_bi FROM bc GROUP BY id)
SELECT CAST(us.id AS BIGINT) AS id, CAST(n_tokens AS BIGINT) AS n_tokens,
       1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS dup_token_frac,
       CAST(top_bi AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS top_bigram_frac
FROM us JOIN bs ON us.id = bs.id
"""


def psi_drift_sql(table: str = "documents", column: str = "n_chars",
                  mod: int = 2, bins: int = 10, eps: float = 1e-6) -> str:
    """Mirror of extras.psi_drift over the doc_id%mod split: bucket edges
    from snapshot A's min/max, Laplace-floored proportions, sig6-rendered
    terms (ln differs in ULPs across engines; the rendering absorbs it)."""
    bucket = (f"CASE WHEN x < mn THEN -1 WHEN x > mx THEN {bins} "
              f"WHEN x >= mx THEN {bins - 1} "
              f"ELSE CAST(floor((x - mn) / w) AS INTEGER) END")
    pa = f"greatest(CAST(n_a AS DOUBLE) / ta, {eps})"
    pb = f"greatest(CAST(n_b AS DOUBLE) / tb, {eps})"
    lo = f"CASE WHEN bucket < 0 THEN NULL ELSE mn + bucket * w END"
    hi = (f"CASE WHEN bucket > {bins - 1} THEN NULL "
          f"WHEN bucket < 0 THEN mn ELSE mn + (bucket + 1) * w END")
    return f"""
WITH sa AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
            WHERE doc_id % {mod} = 0 AND {column} IS NOT NULL),
sb AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
       WHERE doc_id % {mod} = 1 AND {column} IS NOT NULL),
m AS (SELECT min(x) AS mn, max(x) AS mx,
             (max(x) - min(x)) / {float(bins)} AS w FROM sa),
ca AS (SELECT {bucket} AS bucket, count(*) AS n
       FROM sa CROSS JOIN m GROUP BY 1),
cb AS (SELECT {bucket} AS bucket, count(*) AS n
       FROM sb CROSS JOIN m GROUP BY 1),
j AS (SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
             COALESCE(ca.n, 0) AS n_a, COALESCE(cb.n, 0) AS n_b
      FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
t AS (SELECT (SELECT sum(n_a) FROM j) AS ta,
             (SELECT sum(n_b) FROM j) AS tb)
SELECT CAST(bucket AS INTEGER) AS bucket,
       {duck_sig6(lo)} AS lo, {duck_sig6(hi)} AS hi,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       {duck_sig6(pa)} AS pct_a, {duck_sig6(pb)} AS pct_b,
       {duck_sig6(f"({pa} - {pb}) * ln({pa} / {pb})")} AS psi_term
FROM j CROSS JOIN m CROSS JOIN t
"""


def vocabulary_sql(table: str = "documents", min_count: int = 5) -> str:
    """Mirror of text.vocabulary."""
    return (f"WITH {_tokens_cte(table)}, "
            f"tok AS (SELECT id, unnest(toks) AS token FROM t) "
            f"SELECT token, CAST(count(*) AS BIGINT) AS n_total, "
            f"CAST(count(DISTINCT id) AS BIGINT) AS n_docs "
            f"FROM tok GROUP BY token HAVING count(*) >= {min_count}")


def countmin_topk_sql(table: str = "documents", k: int = 20,
                      depth: int = 4, width: int = 1024) -> str:
    """Mirror of sketch.countmin_topk (md5-derived bucket hashes)."""
    def bucket(j: int) -> str:
        return H.duck_token_hash(f"'cm{j}/' || token") + f" % {width}"
    grid_rows = " UNION ALL ".join(
        f"SELECT {j} AS d, {bucket(j)} AS b FROM tok" for j in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT token, {j} AS d, {bucket(j)} AS b FROM dist"
        for j in range(depth))
    return f"""
WITH {_tokens_cte(table)},
tok AS (SELECT unnest(toks) AS token FROM t),
grid AS ({grid_rows}),
sketch AS (SELECT d, b, count(*) AS c FROM grid GROUP BY d, b),
dist AS (SELECT DISTINCT token FROM tok),
probes AS ({probe_rows}),
est AS (SELECT token, CAST(min(c) AS BIGINT) AS est
        FROM probes JOIN sketch USING (d, b) GROUP BY token)
SELECT token, est,
       CAST(row_number() OVER (ORDER BY est DESC, token ASC) AS INTEGER)
       AS rank
FROM est QUALIFY rank <= {k}
"""


def asof_join_sql(table: str = "events", marker: str = "purchase") -> str:
    """Mirror of joins.asof_join for the gated query: every event joined
    to the latest same-user '{marker}' event at or before it. Same union
    trick: struct payload carried by last_value IGNORE NULLS (struct, not
    per-field, so a NULL payload FIELD doesn't skip to an older row)."""
    return f"""
WITH l AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                  event_type, value FROM {table}),
r AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
      FROM {table} WHERE event_type = '{marker}'),
u AS (
  SELECT user_id AS by_k, ts, 1 AS side,
         {{'event_id': event_id, 'event_type': event_type,
           'value': value}} AS lpay,
         CAST(NULL AS STRUCT(event_id BIGINT, value DOUBLE)) AS rpay
  FROM l
  UNION ALL
  SELECT user_id, ts, 0, NULL,
         {{'event_id': event_id, 'value': value}}
  FROM r),
f AS (
  SELECT *, last_value(rpay IGNORE NULLS) OVER (
            PARTITION BY by_k ORDER BY ts ASC, side ASC,
                                       rpay.event_id ASC NULLS LAST
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rf
  FROM u)
SELECT CAST(lpay.event_id AS BIGINT) AS event_id, ts,
       CAST(by_k AS BIGINT) AS user_id, lpay.event_type AS event_type,
       lpay.value AS value,
       CAST(rf.event_id AS BIGINT) AS asof_event_id,
       rf.value AS asof_value
FROM f WHERE side = 1
"""


def range_join_sql(table: str = "events", gap_minutes: int = 30) -> str:
    """Mirror of the range-join gated query: events joined to their own
    gaps-and-islands sessions (session end = last event + gap, exclusive).
    Boundary semantics follow Spark session_window: a new session starts
    only when the inter-event gap is strictly greater than ``gap``."""
    g = f"INTERVAL '{gap_minutes} minutes'"
    return f"""
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM {table}),
o AS (SELECT *, CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                          > {g} THEN 1 ELSE 0 END AS brk FROM e),
gi AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid FROM o),
s AS (SELECT user_id, sid, min(t) AS session_start,
             max(t) + {g} AS session_end
      FROM gi GROUP BY user_id, sid)
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id, e.t AS ts,
       s.session_start, s.session_end
FROM e JOIN s ON e.user_id = s.user_id
             AND e.t >= s.session_start AND e.t < s.session_end
"""


def column_entropy_sql(table: str, columns: list[str]) -> str:
    """Mirror of extras.column_entropy. DuckDB groups by the NATIVE value
    where Spark groups by the string cast — both injective per engine, and
    only aggregates (counts, entropy) leave the query, so the rendering
    difference cannot surface."""
    branches = []
    for c in columns:
        ent = "ln(CAST(n AS DOUBLE)) - s / n"
        branches.append(f"""
(WITH c AS (SELECT {c} AS v, count(*) AS cnt FROM {table} GROUP BY 1),
a AS (SELECT
  coalesce(sum(cnt) FILTER (v IS NOT NULL), 0) AS n,
  coalesce(sum(cnt) FILTER (v IS NULL), 0) AS nulls,
  count(*) FILTER (v IS NOT NULL) AS dv,
  max(cnt) FILTER (v IS NOT NULL) AS topc,
  sum(CASE WHEN v IS NOT NULL THEN cnt * ln(cnt) END) AS s
 FROM c)
SELECT '{c}' AS "column", CAST(n AS BIGINT) AS n_non_null,
  CAST(nulls AS BIGINT) AS null_count,
  CAST(dv AS BIGINT) AS distinct_values,
  {duck_sig6('topc / CAST(n AS DOUBLE)')} AS top_freq,
  {duck_sig6(f'CASE WHEN n > 0 THEN {ent} END')} AS entropy,
  {duck_sig6(f'CASE WHEN dv > 1 THEN ({ent}) / ln(CAST(dv AS DOUBLE)) '
             'WHEN n > 0 THEN 0.0 END')} AS entropy_norm
FROM a)""")
    return "\nUNION ALL\n".join(branches)


def referential_integrity_composite_sql() -> str:
    """extras.referential_integrity with a COMPOSITE key mirrored on
    the shared linepairs/fact fixture (see fk_discover_composite_sql):
    the fk is (orderkey, swapped linenumber), the pk the distinct true
    pair — null_fk injected by NULLing f_linenumber on doc % 17 = 0
    rows so every counter is non-vacuous."""
    return f"""
WITH linepairs AS (
  SELECT DISTINCT l_orderkey AS p_orderkey,
         l_linenumber AS p_linenumber FROM lineitem),
fact AS (
  SELECT l_orderkey AS f_orderkey,
         CASE WHEN l_orderkey % 17 = 0 THEN NULL
              WHEN l_orderkey % 13 = 0 THEN 8 - l_linenumber
              ELSE l_linenumber END AS f_linenumber FROM lineitem),
k AS (SELECT DISTINCT p_orderkey AS k1, p_linenumber AS k2
      FROM linepairs
      WHERE p_orderkey IS NOT NULL AND p_linenumber IS NOT NULL),
j AS (SELECT f.f_orderkey AS f1, f.f_linenumber AS f2,
             k.k1 FROM fact f
      LEFT JOIN k ON f.f_orderkey = k.k1
                 AND f.f_linenumber = k.k2),
a AS (SELECT
  count(*) FILTER (f1 IS NOT NULL AND f2 IS NOT NULL) AS fk_rows,
  count(*) FILTER (f1 IS NULL OR f2 IS NULL) AS null_fk,
  count(*) FILTER (f1 IS NOT NULL AND f2 IS NOT NULL
                   AND k1 IS NOT NULL) AS matched,
  count(*) FILTER (f1 IS NOT NULL AND f2 IS NOT NULL
                   AND k1 IS NULL) AS orphans,
  count(DISTINCT (f1, f2)) FILTER (f1 IS NOT NULL AND f2 IS NOT NULL
                                   AND k1 IS NULL)
    AS distinct_orphan_keys
 FROM j)
SELECT CAST(fk_rows AS BIGINT) AS fk_rows,
  CAST(null_fk AS BIGINT) AS null_fk, CAST(matched AS BIGINT) AS matched,
  CAST(orphans AS BIGINT) AS orphans,
  {duck_sig6('CASE WHEN fk_rows > 0 '
             'THEN orphans / CAST(fk_rows AS DOUBLE) END')}
    AS orphan_fraction,
  CAST(distinct_orphan_keys AS BIGINT) AS distinct_orphan_keys
FROM a"""


def referential_integrity_sql(fact: str, dim_sql: str, fk: str,
                              pk: str) -> str:
    """Mirror of extras.referential_integrity (``dim_sql`` is a full
    SELECT so gated queries can use a filtered dim)."""
    return f"""
WITH k AS (SELECT DISTINCT {pk} AS kk FROM ({dim_sql})),
j AS (SELECT f.{fk} AS fk, k.kk FROM {fact} f
      LEFT JOIN k ON f.{fk} = k.kk),
a AS (SELECT
  count(*) FILTER (fk IS NOT NULL) AS fk_rows,
  count(*) FILTER (fk IS NULL) AS null_fk,
  count(*) FILTER (fk IS NOT NULL AND kk IS NOT NULL) AS matched,
  count(*) FILTER (fk IS NOT NULL AND kk IS NULL) AS orphans,
  count(DISTINCT fk) FILTER (fk IS NOT NULL AND kk IS NULL)
    AS distinct_orphan_keys
 FROM j)
SELECT CAST(fk_rows AS BIGINT) AS fk_rows,
  CAST(null_fk AS BIGINT) AS null_fk, CAST(matched AS BIGINT) AS matched,
  CAST(orphans AS BIGINT) AS orphans,
  {duck_sig6('CASE WHEN fk_rows > 0 '
             'THEN orphans / CAST(fk_rows AS DOUBLE) END')}
    AS orphan_fraction,
  CAST(distinct_orphan_keys AS BIGINT) AS distinct_orphan_keys
FROM a"""


def benford_sql(table: str, column: str) -> str:
    """Mirror of extras.benford_digits: leading digit from the exact
    decimal/integer STRING form (engine-identical for non-float types)."""
    return f"""
WITH d AS (SELECT regexp_extract(CAST({column} AS VARCHAR), '([1-9])', 1)
             AS dg FROM {table} WHERE {column} IS NOT NULL),
g AS (SELECT dg, count(*) AS n FROM d WHERE dg <> '' GROUP BY dg),
t AS (SELECT sum(n) AS tot FROM g)
SELECT CAST(dg AS INTEGER) AS digit, CAST(n AS BIGINT) AS n,
  {duck_sig6('n / CAST(tot AS DOUBLE)')} AS frac,
  {duck_sig6('log10(1.0 + 1.0 / CAST(dg AS DOUBLE))')} AS expected,
  {duck_sig6('abs(n / CAST(tot AS DOUBLE) '
             '- log10(1.0 + 1.0 / CAST(dg AS DOUBLE)))')} AS abs_dev
FROM g, t"""


def tfidf_top_terms_sql(table: str = "documents", k: int = 5) -> str:
    """Mirror of text.tfidf_top_terms: smoothed idf, rank on the
    sig6-ROUNDED score (see the Spark docstring — raw ln() ulps could
    flip near-ties), ties by token asc."""
    score = ("tf * (ln((nd + 1.0) / (df_docs + 1.0)) + 1.0)")
    return f"""
WITH {_tokens_cte(table)},
tok AS (SELECT id, unnest(toks) AS token FROM t),
tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY id, token),
dfq AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY token),
nd AS (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS nd FROM tf),
s AS (SELECT tf.id, tf.token, tf.tf, dfq.df_docs,
        {duck_sig6(score)} AS tfidf
      FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN nd)
SELECT CAST(id AS BIGINT) AS id, token, CAST(tf AS BIGINT) AS tf,
  CAST(df_docs AS BIGINT) AS df_docs, tfidf,
  CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY id
        ORDER BY CAST(tfidf AS DOUBLE) DESC, token ASC) AS rn FROM s)
WHERE rn <= {k}"""


def histogram_equidepth_sql(table: str, column: str,
                            buckets: int = 10) -> str:
    """Mirror of extras.histogram_equidepth: boundaries are the exact
    percentiles sig6-rounded THEN cast back to double (identical literal
    cutpoints on both engines), bucket = count of cutpoints below x."""
    probs = [i / buckets for i in range(1, buckets)]
    plist = ", ".join(repr(p) for p in probs)
    cut = (lambda i:
           f"CAST({duck_sig6(f'qs[{i + 1}]')} AS DOUBLE)")
    bucket = " + ".join(
        f"(CASE WHEN x > {cut(i)} THEN 1 ELSE 0 END)"
        for i in range(len(probs)))
    lo_case = " ".join(
        [f"WHEN b = 0 THEN mn"]
        + [f"WHEN b = {i + 1} THEN {cut(i)}" for i in range(len(probs))])
    hi_case = " ".join(
        [f"WHEN b = {i} THEN {cut(i)}" for i in range(len(probs))]
        + [f"WHEN b = {len(probs)} THEN mx"])
    return f"""
WITH q AS (SELECT quantile_cont(CAST({column} AS DOUBLE),
                                [{plist}]) AS qs,
                  min(CAST({column} AS DOUBLE)) AS mn,
                  max(CAST({column} AS DOUBLE)) AS mx
           FROM {table}),
d AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
      WHERE {column} IS NOT NULL),
b AS (SELECT ({bucket}) AS b FROM d, q),
g AS (SELECT b, count(*) AS cnt FROM b GROUP BY b)
SELECT CAST(g.b AS INTEGER) AS bucket,
  (CASE {lo_case} END) AS lo, (CASE {hi_case} END) AS hi,
  CAST(cnt AS BIGINT) AS cnt
FROM g, q"""


def categorical_association_sql(table: str, col_a: str,
                                col_b: str) -> str:
    """Mirror of extras.categorical_association (chi2 over the full
    expected grid, MI over observed cells, both in one joint-table
    rollup)."""
    return f"""
WITH joint AS (SELECT {col_a} AS a, {col_b} AS b, count(*) AS o
               FROM {table}
               WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
               GROUP BY 1, 2),
ma AS (SELECT a, sum(o) AS ra FROM joint GROUP BY a),
mb AS (SELECT b, sum(o) AS rb FROM joint GROUP BY b),
tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS ka,
               count(DISTINCT b) AS kb FROM joint),
grid AS (SELECT ma.a, mb.b, ma.ra, mb.rb, tot.n, tot.ka, tot.kb,
                coalesce(joint.o, 0) AS o
         FROM ma CROSS JOIN mb CROSS JOIN tot
         LEFT JOIN joint ON joint.a = ma.a AND joint.b = mb.b),
terms AS (SELECT n, ka, kb,
  (o - ra * rb / CAST(n AS DOUBLE)) * (o - ra * rb / CAST(n AS DOUBLE))
    / (ra * rb / CAST(n AS DOUBLE)) AS chi_t,
  CASE WHEN o > 0 THEN o / CAST(n AS DOUBLE)
       * ln(o * CAST(n AS DOUBLE) / (CAST(ra AS DOUBLE) * rb))
       ELSE 0.0 END AS mi_t
  FROM grid),
a AS (SELECT n, ka, kb, sum(chi_t) AS chi2, sum(mi_t) AS mi
      FROM terms GROUP BY n, ka, kb)
SELECT CAST(n AS BIGINT) AS n, CAST(ka AS BIGINT) AS distinct_a,
  CAST(kb AS BIGINT) AS distinct_b,
  {duck_sig6('chi2')} AS chi2,
  {duck_sig6('CASE WHEN least(ka, kb) > 1 THEN '
             'sqrt(chi2 / (CAST(n AS DOUBLE) * (least(ka, kb) - 1))) '
             'END')} AS cramers_v,
  {duck_sig6('mi')} AS mutual_info
FROM a"""


def char_entropy_sql(table: str = "documents") -> str:
    """Mirror of text.char_entropy: H = ln(n) - (sum c ln c)/n over
    character unigrams (string_split '' == the Spark per-codepoint split
    on this ASCII fixture)."""
    return f"""
WITH d AS (SELECT doc_id AS id, unnest(string_split(text, '')) AS ch
           FROM {table} WHERE text IS NOT NULL AND length(text) > 0),
c AS (SELECT id, ch, count(*) AS c FROM d GROUP BY id, ch),
a AS (SELECT id, sum(c) AS n, count(*) AS dc,
             sum(c * ln(c)) AS s FROM c GROUP BY id)
SELECT CAST(id AS BIGINT) AS id, CAST(n AS BIGINT) AS n_chars,
  CAST(dc AS BIGINT) AS distinct_chars,
  {duck_sig6('ln(CAST(n AS DOUBLE)) - s / n')} AS char_entropy
FROM a"""


def cluster_size_histogram_sql(table: str = "documents",
                               threshold: float = 0.5) -> str:
    """Mirror of dedup.cluster_size_histogram over the recursive-CC
    cluster labels."""
    return f"""
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM (SELECT cluster_id, count(*) AS cluster_size
      FROM ({neardup_clusters_sql(table, threshold)})
      GROUP BY cluster_id)
GROUP BY cluster_size"""


def weighted_sample_sql(table: str, weight_sql: str,
                        id_col: str = "doc_id",
                        salt: str = "wsample") -> str:
    """Mirror of sampling.weighted_sample: integer-bucket comparison, the
    per-row threshold floor()ed from the same double on both engines."""
    from flink_descriptive_stats_spark.operators import sampling as SP
    bucket = (H.duck_token_hash(f"CAST({id_col} AS VARCHAR) || '/{salt}'")
              + f" % {SP.BUCKETS}")
    thresh = (f"CAST(floor(greatest(0.0, least({weight_sql}, 1.0)) "
              f"* {float(SP.BUCKETS)}) AS BIGINT)")
    return f"SELECT * FROM {table} WHERE {bucket} < {thresh}"


def profile_compare_sql(table: str, columns: list[str],
                        pred_a: str, pred_b: str) -> str:
    """Mirror of extras.profile_compare between two predicate-defined
    snapshots of one table."""
    def side(pred: str, tag: str) -> str:
        branches = " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", count(*) AS rows_{tag}, "
            f"count({c}) AS n_{tag}, avg(CAST({c} AS DOUBLE)) AS mu_{tag}, "
            f"stddev_pop(CAST({c} AS DOUBLE)) AS sd_{tag} "
            f"FROM {table} WHERE {pred}" for c in columns)
        return f"({branches})"
    nr = lambda t: f"(1.0 - n_{t} / CAST(rows_{t} AS DOUBLE))"
    pooled = "sqrt((sd_a * sd_a + sd_b * sd_b) / 2.0)"
    return f"""
SELECT a."column", CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  {duck_sig6(nr('a'))} AS null_rate_a, {duck_sig6(nr('b'))} AS null_rate_b,
  {duck_sig6('mu_a')} AS mean_a, {duck_sig6('mu_b')} AS mean_b,
  {duck_sig6('sd_a')} AS stddev_a, {duck_sig6('sd_b')} AS stddev_b,
  {duck_sig6(f'CASE WHEN {pooled} > 0 '
             f'THEN abs(mu_b - mu_a) / {pooled} END')} AS mean_shift_sigmas,
  {duck_sig6(f"{nr('b')} - {nr('a')}")} AS null_rate_delta
FROM {side(pred_a, 'a')} a JOIN {side(pred_b, 'b')} b USING ("column")"""


def ks_drift_sql(table: str, column: str, pred_a: str, pred_b: str) -> str:
    """Mirror of extras.ks_drift: integer sup of
    |cum_a * n_b - cum_b * n_a|, one terminal division."""
    return f"""
WITH va AS (SELECT CAST({column} AS DOUBLE) AS x, count(*) AS c_a
            FROM {table} WHERE {pred_a} AND {column} IS NOT NULL
            GROUP BY 1),
vb AS (SELECT CAST({column} AS DOUBLE) AS x, count(*) AS c_b
       FROM {table} WHERE {pred_b} AND {column} IS NOT NULL GROUP BY 1),
m AS (SELECT coalesce(va.x, vb.x) AS x, coalesce(c_a, 0) AS c_a,
             coalesce(c_b, 0) AS c_b
      FROM va FULL OUTER JOIN vb ON va.x = vb.x),
c AS (SELECT sum(c_a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(c_b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM m),
t AS (SELECT sum(c_a) AS n_a, sum(c_b) AS n_b FROM m)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
  {duck_sig6('max(abs(cum_a * t.n_b - cum_b * t.n_a)) '
             '/ (CAST(t.n_a AS DOUBLE) * t.n_b)')} AS ks_stat
FROM c, t GROUP BY t.n_a, t.n_b"""


def winsorize_mean_sql(table: str, column: str, lower: float = 0.01,
                       upper: float = 0.99) -> str:
    """Oracle for the winsorize gate: clamp to the sig6-rounded exact
    percentiles, then aggregate (count, min, max, mean) — comparing the
    transform through a bounded summary instead of hash-matching a full
    transformed copy of the table."""
    cut = lambda p: (
        f"CAST({duck_sig6(f'quantile_cont(CAST({column} AS DOUBLE), {p})')} "
        f"AS DOUBLE)")
    return f"""
WITH q AS (SELECT {cut(lower)} AS lo, {cut(upper)} AS hi FROM {table}),
d AS (SELECT CASE WHEN x < lo THEN lo WHEN x > hi THEN hi ELSE x END AS cx
      FROM (SELECT CAST({column} AS DOUBLE) AS x FROM {table}), q)
SELECT CAST(count(cx) AS BIGINT) AS n,
  min(cx) AS min_val, max(cx) AS max_val,
  {duck_sig6('avg(cx)')} AS mean_val
FROM d"""


def funnel_sql(table: str = "events",
               steps: tuple = ("view", "click", "purchase"),
               within_minutes: int | None = None) -> str:
    """Mirror of events.funnel (ordered completion, strict > chaining;
    optional first-step-anchored conversion window)."""
    dl = (f", min(CAST(ts AS TIMESTAMP)) "
          f"+ INTERVAL {within_minutes} MINUTES AS deadline"
          if within_minutes is not None else "")
    ctes = [f"s1 AS (SELECT user_id AS k, min(CAST(ts AS TIMESTAMP)) AS ct"
            f"{dl} FROM {table} WHERE event_type = '{steps[0]}' "
            f"GROUP BY 1)"]
    for i, step in enumerate(steps[1:], start=2):
        win = (f"AND CAST(e.ts AS TIMESTAMP) <= s{i - 1}.deadline "
               if within_minutes is not None else "")
        dl2 = (f", min(s{i - 1}.deadline) AS deadline"
               if within_minutes is not None else "")
        ctes.append(
            f"s{i} AS (SELECT e.user_id AS k, "
            f"min(CAST(e.ts AS TIMESTAMP)) AS ct{dl2} "
            f"FROM {table} e JOIN s{i - 1} ON e.user_id = s{i - 1}.k "
            f"WHERE e.event_type = '{step}' "
            f"AND CAST(e.ts AS TIMESTAMP) > s{i - 1}.ct {win}GROUP BY 1)")
    counts = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n FROM (VALUES (1))"
        for i, s in enumerate(steps, start=1))
    return f"""
WITH {', '.join(ctes)},
c AS ({counts}),
f AS (SELECT n AS fn FROM c WHERE step_idx = 1)
SELECT c.step_idx, c.step, CAST(c.n AS BIGINT) AS n_users,
  {duck_sig6('CASE WHEN f.fn > 0 THEN c.n / CAST(f.fn AS DOUBLE) END')}
    AS pct_of_first,
  {duck_sig6('CASE WHEN coalesce(p.n, f.fn) > 0 '
             'THEN c.n / CAST(coalesce(p.n, f.fn) AS DOUBLE) END')}
    AS pct_of_prev
FROM c CROSS JOIN f LEFT JOIN c p ON p.step_idx = c.step_idx - 1"""


def retention_cohorts_sql(table: str = "events",
                          max_offset: int | None = None) -> str:
    """Mirror of events.retention_cohorts (Monday-start weeks on both
    engines; offset via floor integer division of day deltas)."""
    lim = (f"WHERE week_offset <= {max_offset}" if max_offset is not None
           else "")
    return f"""
WITH ev AS (SELECT user_id AS k,
              date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
            FROM {table}),
f AS (SELECT k, min(w) AS cohort_week FROM ev GROUP BY k),
a AS (SELECT DISTINCT k, w FROM ev),
j0 AS (SELECT a.k, f.cohort_week,
         CAST(datediff('day', f.cohort_week, a.w) // 7 AS INTEGER)
           AS week_offset
       FROM a JOIN f ON a.k = f.k),
j AS (SELECT * FROM j0 {lim}),
sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1)
SELECT j.cohort_week, j.week_offset,
  CAST(count(DISTINCT j.k) AS BIGINT) AS n_active,
  {duck_sig6('count(DISTINCT j.k) / CAST(sz.cohort_size AS DOUBLE)')}
    AS retention_frac
FROM j JOIN sz USING (cohort_week)
GROUP BY j.cohort_week, j.week_offset, sz.cohort_size"""


def resample_sql(table: str = "events", every_minutes: int = 60,
                 fill: str = "locf") -> str:
    """Mirror of events.resample (epoch-second buckets, generate_series
    grid, IGNORE NULLS carry-forward)."""
    step = every_minutes * 60
    filled = ("last_value(v IGNORE NULLS) OVER "
              "(ORDER BY b ROWS UNBOUNDED PRECEDING)"
              if fill == "locf" else "v")
    return f"""
WITH a AS (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / {step})
                       * {step} AS BIGINT) AS b,
                  count(value) AS n, avg(value) AS v
           FROM {table} WHERE ts IS NOT NULL GROUP BY 1),
mm AS (SELECT min(b) AS lo, max(b) AS hi FROM a),
g AS (SELECT unnest(generate_series(lo, hi, {step})) AS b FROM mm),
j AS (SELECT g.b, a.n, a.v FROM g LEFT JOIN a ON g.b = a.b),
w AS (SELECT b, n, {filled} AS fv FROM j)
SELECT to_timestamp(b) AT TIME ZONE 'UTC' AS bucket_ts,
  CAST(coalesce(n, 0) AS BIGINT) AS n,
  {duck_sig6('fv')} AS avg_val,
  (n IS NULL) AS filled
FROM w"""


def bigram_conditional_entropy_sql(table: str = "documents") -> str:
    """Mirror of text.bigram_conditional_entropy over the shared token
    CTE."""
    return f"""
WITH {_tokens_cte(table)},
t2 AS (SELECT toks FROM t WHERE len(toks) >= 2),
bg AS (SELECT toks[i] AS prev, toks[i + 1] AS nxt
       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
             FROM t2)),
bc AS (SELECT prev, nxt, count(*) AS c FROM bg GROUP BY prev, nxt),
pc AS (SELECT prev, sum(c) AS cp FROM bc GROUP BY prev),
a AS (SELECT sum(c) AS nb, count(*) AS ndb,
             count(DISTINCT bc.prev) AS ndt,
             sum(c * ln(cp) - c * ln(c)) AS h
      FROM bc JOIN pc ON bc.prev = pc.prev)
SELECT CAST(nb AS BIGINT) AS n_bigrams,
  CAST(ndb AS BIGINT) AS n_distinct_bigrams,
  CAST(ndt AS BIGINT) AS n_distinct_tokens,
  {duck_sig6('h / CAST(nb AS DOUBLE)')} AS cond_entropy
FROM a"""


def robust_outliers_sql(table: str, columns: list[str],
                        threshold: float = 3.5) -> str:
    """Mirror of extras.robust_outlier_counts: the median and MAD are
    sig6-rounded then re-inlined (as in the Spark op) so the discrete
    fence counts match exactly."""
    branches = []
    med = lambda c: duck_sig6(f"quantile_cont(CAST({c} AS DOUBLE), 0.5)")
    for c in columns:
        branches.append(f"""
(WITH m AS (SELECT CAST({med(c)} AS DOUBLE) AS md FROM {table}),
 d AS (SELECT CAST({duck_sig6(
     f'quantile_cont(abs(CAST({c} AS DOUBLE) - m.md), 0.5)')} AS DOUBLE)
         AS mad, any_value(m.md) AS md
       FROM {table}, m GROUP BY ALL)
SELECT '{c}' AS "column",
  CASE WHEN md IS NOT NULL THEN {duck_sig6('md')} END AS median,
  CASE WHEN md IS NOT NULL THEN {duck_sig6('mad')} END AS mad,
  CAST(CASE WHEN md IS NULL OR mad = 0 THEN 0 ELSE
    (SELECT count(*) FROM {table}, d
     WHERE abs(CAST({c} AS DOUBLE) - d.md) > {threshold} * d.mad) END
    AS BIGINT) AS n_outliers
FROM d)""")
    return "\nUNION ALL\n".join(branches)


def fd_candidates_sql(table: str, pairs: list[tuple[str, str]]) -> str:
    """Mirror of extras.fd_candidates (ROW() tuples make NULLs compare
    equal, matching count_distinct over a struct)."""
    branches = []
    for a, b in pairs:
        branches.append(f"""
SELECT '{a}' AS determinant, '{b}' AS dependent,
  CAST(count(DISTINCT ROW({a})) AS BIGINT) AS n_determinant,
  CAST(count(DISTINCT ROW({a}, {b})) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT ROW({a}, {b})) - count(DISTINCT ROW({a}))
       AS BIGINT) AS n_violations,
  (count(DISTINCT ROW({a}, {b})) = count(DISTINCT ROW({a}))) AS fd_holds
FROM {table}""")
    return "\nUNION ALL\n".join(branches)


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(v)


def check_constraints_sql(table: str, rules: list[tuple]) -> str:
    """Mirror of quality.check_constraints: every rule folded into ONE
    aggregate scan (a CTE), then one literal row per rule referencing it.
    Rule labels are produced by the same quality.rule_label helper the
    Spark op uses, so the report keys are identical by construction."""
    from flink_descriptive_stats_spark.operators.quality import rule_label
    exprs = []
    for i, r in enumerate(rules):
        kind, c = r[0], r[1]
        if kind == "not_null":
            e = f"count(CASE WHEN {c} IS NULL THEN 1 END)"
        elif kind == "unique":
            e = f"count({c}) - count(DISTINCT {c})"
        elif kind == "in_range":
            e = (f"count(CASE WHEN NOT ({c} BETWEEN {_sql_lit(r[2])} "
                 f"AND {_sql_lit(r[3])}) THEN 1 END)")
        elif kind == "matches":
            e = (f"count(CASE WHEN {c} IS NOT NULL AND NOT "
                 f"regexp_matches(CAST({c} AS VARCHAR), {_sql_lit(r[2])})"
                 f" THEN 1 END)")
        elif kind == "in_set":
            vals = ", ".join(_sql_lit(v) for v in r[2])
            e = (f"count(CASE WHEN {c} IS NOT NULL AND {c} NOT IN "
                 f"({vals}) THEN 1 END)")
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        exprs.append(f"{e} AS v{i}")
    branches = []
    for i, r in enumerate(rules):
        branches.append(
            f"SELECT {_sql_lit(rule_label(r))} AS rule, "
            f"{_sql_lit(r[1])} AS \"column\", n AS n_rows, "
            f"CAST(v{i} AS BIGINT) AS n_violations, "
            f"v{i} = 0 AS passed FROM agg")
    return (f"WITH agg AS (SELECT count(*) AS n, {', '.join(exprs)} "
            f"FROM {table})\n" + "\nUNION ALL\n".join(branches))


def autocorrelation_sql(table: str = "events", key: str = "event_type",
                        ts: str = "ts", id_col: str = "event_id",
                        value: str = "value", max_lag: int = 5) -> str:
    """Mirror of events.autocorrelation: same (ts, id)-total-ordered lags,
    same single grouped pass computing den + all lag numerators."""
    lags = ", ".join(
        f"lag(x, {k}) OVER win AS x{k}" for k in range(1, max_lag + 1))
    nums = ", ".join(
        f"sum((x - mu) * (x{k} - mu)) AS num{k}, count(x{k}) AS n{k}"
        for k in range(1, max_lag + 1))
    branches = [
        f"SELECT series, {k} AS lag, CAST(n{k} AS BIGINT) AS n_pairs, "
        f"{duck_sig6(f'num{k} / den')} AS acf FROM g"
        for k in range(1, max_lag + 1)]
    return f"""
WITH m AS (SELECT {key} AS series, avg(CAST({value} AS DOUBLE)) AS mu
           FROM {table} GROUP BY 1),
 l AS (SELECT {key} AS series, CAST({value} AS DOUBLE) AS x, {lags}
       FROM {table}
       WINDOW win AS (PARTITION BY {key} ORDER BY {ts}, {id_col})),
 g AS (SELECT l.series, sum((x - mu) * (x - mu)) AS den, {nums}
       FROM l JOIN m ON l.series = m.series GROUP BY 1)
""" + "\nUNION ALL\n".join(branches)


def transition_matrix_sql(table: str = "events", key: str = "user_id",
                          type_col: str = "event_type", ts: str = "ts",
                          id_col: str = "event_id") -> str:
    """Mirror of events.transition_matrix (lead over the same total
    per-user order, bounded (cur, next) counts, window normalization)."""
    return f"""
WITH p AS (SELECT {type_col} AS cur_type,
                  lead({type_col}) OVER (PARTITION BY {key}
                                         ORDER BY {ts}, {id_col})
                    AS next_type
           FROM {table}),
 c AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
       FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
 r AS (SELECT cur_type, next_type, n,
              CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur_type)
                AS praw
       FROM c)
SELECT cur_type, next_type, n, {duck_sig6('praw')} AS prob FROM r"""


def rollup_profile_sql(table: str = "events", key: str = "event_type",
                       ts: str = "ts", value: str = "value") -> str:
    """Mirror of events.rollup_profile: GROUP BY ROLLUP with the same
    grouping-id encoding (0 cell / 1 key subtotal / 3 grand total)."""
    return f"""
SELECT {key} AS key, strftime(date_trunc('day', {ts}), '%Y-%m-%d') AS day,
  CAST(GROUPING({key}, date_trunc('day', {ts})) AS BIGINT) AS gid,
  CAST(count(*) AS BIGINT) AS n,
  {duck_sig6(f'avg(CAST({value} AS DOUBLE))')} AS avg_val,
  min(CAST({value} AS DOUBLE)) AS min_val,
  max(CAST({value} AS DOUBLE)) AS max_val
FROM {table}
GROUP BY ROLLUP ({key}, date_trunc('day', {ts}))"""


def typo_pairs_sql(table: str = "documents", text_col: str = "text",
                   max_dist: int = 2, min_count: int = 1,
                   max_token_len: int = 24) -> str:
    """Mirror of text.typo_pairs — the oracle is the SPEC (exhaustive
    vocabulary self-join + levenshtein), the Spark op is the SymSpell
    scale path; both must emit identical pairs."""
    return f"""
WITH v AS (SELECT w AS token, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest({H.duck_tokens(text_col)}) AS w
                 FROM {table} WHERE {text_col} IS NOT NULL)
           GROUP BY 1
           HAVING count(*) >= {min_count}),
 vv AS (SELECT * FROM v WHERE length(token) <= {max_token_len})
SELECT a.token AS token_a, b.token AS token_b, a.n AS n_a, b.n AS n_b,
       CAST(levenshtein(a.token, b.token) AS INTEGER) AS dist
FROM vv a, vv b
WHERE a.token < b.token AND levenshtein(a.token, b.token) <= {max_dist}"""


def semdedup_sql(table: str = "embeddings", threshold: float = 0.95,
                 n_cells: int = 16) -> str:
    """Mirror of similarity.semdedup (seed-vector cells): same crank=1
    assignment as ivf_topk_sql, then the within-cell earlier-id neighbor
    rule with the identical left-fold dot product."""
    cdot = _DOT.format(a="n.v", b="cent.cv")
    pdot = _DOT.format(a="x.v", b="y.v")
    return f"""
WITH {_norm_cte(table)},
cent AS (SELECT id AS cell_id, v AS cv, norm AS cnorm FROM n
         WHERE id < {n_cells}),
sc AS (SELECT n.id, n.v, n.norm, cent.cell_id,
              row_number() OVER (PARTITION BY n.id
                ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC,
                         cent.cell_id ASC) AS crank
       FROM n CROSS JOIN cent),
a AS (SELECT id, v, norm, cell_id FROM sc WHERE crank = 1),
dup AS (SELECT x.id, min(y.id) AS dup_of
        FROM a x JOIN a y ON x.cell_id = y.cell_id AND y.id < x.id
        WHERE ({pdot}) / (x.norm * y.norm) >= {threshold!r}
        GROUP BY x.id)
SELECT CAST(a.id AS BIGINT) AS vec_id, CAST(a.cell_id AS BIGINT) AS cell_id,
       dup.dup_of IS NULL AS kept, CAST(dup.dup_of AS BIGINT) AS dup_of
FROM a LEFT JOIN dup ON a.id = dup.id"""


def daily_profile_sql(table: str = "events", lo: str = "2024-01-10",
                      hi: str = "2024-01-19", value: str = "value") -> str:
    """Mirror of the partitioned-sink round-trip gate: the same day-range
    filter evaluated over the RAW table (no partitioning) — values must be
    identical whichever layout served the scan."""
    day = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
    return f"""
SELECT {day} AS day, CAST(count(*) AS BIGINT) AS n,
  {duck_sig6(f'avg(CAST({value} AS DOUBLE))')} AS avg_val,
  min(CAST({value} AS DOUBLE)) AS min_val,
  max(CAST({value} AS DOUBLE)) AS max_val
FROM {table}
WHERE {day} BETWEEN '{lo}' AND '{hi}'
GROUP BY 1"""


def trend_sql(table: str = "events", key: str = "event_type",
              ts: str = "ts", value: str = "value") -> str:
    """Mirror of events.trend. Spark's unix_timestamp truncates to whole
    seconds; floor(epoch(..)) reproduces that exactly for post-1970
    timestamps, so per-row t is bit-identical and only the summation
    order differs — absorbed by the sig6 rendering of the ratios."""
    t = (f"(floor(epoch({ts})) - "
         f"(SELECT floor(epoch(min({ts}))) FROM {table})) / 3600.0")
    return f"""
WITH b AS (SELECT {key} AS series, {t} AS t, CAST({value} AS DOUBLE) AS x
           FROM {table}
           WHERE {ts} IS NOT NULL AND {value} IS NOT NULL),
 g AS (SELECT series, CAST(count(*) AS BIGINT) AS n, sum(t) AS st,
              sum(x) AS sx, sum(t * x) AS stx, sum(t * t) AS stt,
              sum(x * x) AS sxx
       FROM b GROUP BY 1),
 d AS (SELECT series, n, stx - st * sx / n AS cov,
              stt - st * st / n AS vart, sxx - sx * sx / n AS varx,
              st, sx
       FROM g)
SELECT series, n,
  CASE WHEN vart > 0 THEN {duck_sig6('cov / vart')} END AS slope_per_hour,
  CASE WHEN vart > 0 THEN
    {duck_sig6('(sx - (cov / vart) * st) / n')} END AS intercept,
  CASE WHEN vart > 0 AND varx > 0 THEN
    {duck_sig6('cov * cov / (vart * varx)')} END AS r2
FROM d"""


def lm_score_sql(table: str = "documents", text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    """Mirror of text.lm_score (same tokenizer, same add-1 bigram model,
    same nats)."""
    return f"""
WITH {_tokens_cte(table, id_col, text_col)},
 bgd AS (SELECT id, toks[u.i] AS prev, toks[u.i + 1] AS nxt
         FROM t, LATERAL (SELECT unnest(generate_series(
                1, len(toks) - 1)) AS i) u
         WHERE len(toks) >= 2),
 bc AS (SELECT prev, nxt, count(*) AS c FROM bgd GROUP BY 1, 2),
 pc AS (SELECT prev, sum(c) AS cp FROM bc GROUP BY 1),
 v AS (SELECT count(DISTINCT w) AS vocab
       FROM (SELECT unnest(toks) AS w FROM t)),
 j AS (SELECT bgd.id, ln((bc.c + 1) / (pc.cp + v.vocab)) AS logp
       FROM bgd JOIN bc USING (prev, nxt) JOIN pc USING (prev)
       CROSS JOIN v)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {duck_sig6('-avg(logp)')} AS lm_score
FROM j GROUP BY 1"""


def histogram2d_sql(table: str, col_x: str, col_y: str,
                    bins: int = 10) -> str:
    """Mirror of extras.histogram2d (same edge conventions as the 1-D
    histogram oracle)."""
    def bucket(v, mn, mx):
        return (f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
                f"least(CAST(floor(({v} - {mn}) / "
                f"(({mx} - {mn}) / {float(bins)})) AS INTEGER), "
                f"{bins - 1}) END")
    return f"""
WITH mm AS (SELECT min({col_x}) AS mnx, max({col_x}) AS mxx,
                   min({col_y}) AS mny, max({col_y}) AS mxy
            FROM {table}),
 pts AS (SELECT {col_x} AS x, {col_y} AS y, mnx, mxx, mny, mxy
         FROM {table} CROSS JOIN mm
         WHERE {col_x} IS NOT NULL AND {col_y} IS NOT NULL)
SELECT {bucket('x', 'mnx', 'mxx')} AS bx,
       {bucket('y', 'mny', 'mxy')} AS by,
       CAST(count(*) AS BIGINT) AS cnt
FROM pts GROUP BY 1, 2"""


def lang_confusion_sql(table: str = "documents", text_col: str = "text",
                       lang_col: str = "lang") -> str:
    """Mirror of text.lang_confusion (same scores + tie order as
    lang_id_sql, declared label carried through the same scan)."""
    scores = {lang: _stop_filter(words)
              for lang, words in TX.STOPWORDS.items()}
    scores["zh"] = f"len(regexp_extract_all(text, '{TX.CJK_RE}'))"
    score_cols = ", ".join(f"{scores[lang]} AS s_{lang}"
                           for lang in TX.LANG_ORDER)
    whens = []
    for lang in TX.LANG_ORDER[:-1]:
        cond = " AND ".join(f"s_{lang} >= s_{other}"
                            for other in TX.LANG_ORDER if other != lang)
        whens.append(f"WHEN {cond} THEN '{lang}'")
    pred = f"CASE {' '.join(whens)} ELSE '{TX.LANG_ORDER[-1]}' END"
    return f"""
WITH t AS (SELECT {lang_col} AS declared, {text_col} AS text,
                  {H.duck_tokens(text_col)} AS toks
           FROM {table} WHERE {text_col} IS NOT NULL),
 m AS (SELECT declared, {score_cols} FROM t),
 p AS (SELECT declared, {pred} AS predicted FROM m),
 c AS (SELECT declared, predicted, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2),
 r AS (SELECT declared, predicted, n,
              CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY declared)
                AS sh
       FROM c)
SELECT declared, predicted, n, {duck_sig6('sh')} AS share FROM r"""


def session_summary_sql(table: str = "events",
                        gap_minutes: int = 30) -> str:
    """Mirror of pipeline_stream.session_summary (same gaps-and-islands
    session boundaries as sessionize_sql, then one outer aggregate)."""
    g = f"INTERVAL '{gap_minutes} minutes'"
    return f"""
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM {table}),
l AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
s AS (SELECT *, CASE WHEN pt IS NULL OR t - pt > {g} THEN 1 ELSE 0 END AS ns
      FROM l),
gi AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS sid FROM s),
per AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n,
               epoch(max(t) + {g}) - epoch(min(t)) AS dur
        FROM gi GROUP BY user_id, sid)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT k) AS BIGINT) AS n_users,
       {duck_sig6('avg(n)')} AS avg_events,
       CAST(max(n) AS BIGINT) AS max_events,
       {duck_sig6('avg(dur)')} AS avg_duration_s,
       {duck_sig6('avg(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END)')}
         AS bounce_rate
FROM per"""


def _doc_vec_ctes(table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id", dim: int = 64) -> str:
    """CTE chain producing (id, v, norm) hashed-TF vectors — the mirror of
    text.doc_feature_vectors + similarity.with_norm."""
    th = H.duck_token_hash("w")
    dot = _DOT.format(a="v", b="v")
    return f"""
{_tokens_cte(table, id_col, text_col)},
 tok AS (SELECT id, unnest(toks) AS w FROM t),
 cnt AS (SELECT id, CAST({th} % {dim} AS INTEGER) AS b, count(*) AS c
         FROM tok GROUP BY 1, 2),
 ids AS (SELECT id FROM t),
 g AS (SELECT ids.id, u.i AS b
       FROM ids CROSS JOIN
            (SELECT unnest(generate_series(0, {dim - 1})) AS i) u),
 dv AS (SELECT g.id, list(CAST(coalesce(cnt.c, 0) AS DOUBLE)
                          ORDER BY g.b) AS v
        FROM g LEFT JOIN cnt ON g.id = cnt.id AND g.b = cnt.b
        GROUP BY g.id),
 n AS (SELECT id, v, sqrt({dot}) AS norm FROM dv
       WHERE sqrt({dot}) > 0)"""


def doc_clusters_sql(table: str = "documents", k: int = 8,
                     dim: int = 64) -> str:
    """Mirror of text.doc_clusters (seed centroids = first k doc vectors,
    same crank=1 cosine argmax as ivf_topk_sql)."""
    cdot = _DOT.format(a="n.v", b="cent.cv")
    return f"""
WITH {_doc_vec_ctes(table, dim=dim)},
cent AS (SELECT id AS cell_id, v AS cv, norm AS cnorm FROM n
         WHERE id < {k}),
sc AS (SELECT n.id, cent.cell_id,
              row_number() OVER (PARTITION BY n.id
                ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC,
                         cent.cell_id ASC) AS crank
       FROM n CROSS JOIN cent)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(cell_id AS BIGINT) AS cluster_id
FROM sc WHERE crank = 1"""


def cluster_balanced_sample_sql(table: str = "documents",
                                k_per_cluster: int = 5, k: int = 8,
                                dim: int = 64) -> str:
    """Mirror of sampling.cluster_balanced_sample (doc_clusters_sql +
    the md5-ordered exact-k window)."""
    cdot = _DOT.format(a="n.v", b="cent.cv")
    return f"""
WITH {_doc_vec_ctes(table, dim=dim)},
cent AS (SELECT id AS cell_id, v AS cv, norm AS cnorm FROM n
         WHERE id < {k}),
sc AS (SELECT n.id, cent.cell_id,
              row_number() OVER (PARTITION BY n.id
                ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC,
                         cent.cell_id ASC) AS crank
       FROM n CROSS JOIN cent),
cl AS (SELECT CAST(id AS BIGINT) AS doc_id,
              CAST(cell_id AS BIGINT) AS cluster_id
       FROM sc WHERE crank = 1)
SELECT doc_id, cluster_id FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM cl)
WHERE rk <= {k_per_cluster}"""


def null_pattern_sql(table_expr: str, columns: list[str]) -> str:
    """Mirror of extras.null_pattern_report; ``table_expr`` may be a
    subquery (the gate injects synthetic nulls on both sides)."""
    pat = " || ".join(
        f"CASE WHEN {c} IS NULL THEN '1' ELSE '0' END" for c in columns)
    return f"""
WITH c AS (SELECT {pat} AS pattern, CAST(count(*) AS BIGINT) AS n
           FROM {table_expr} GROUP BY 1),
 r AS (SELECT pattern, n, CAST(n AS DOUBLE) / sum(n) OVER () AS praw
       FROM c)
SELECT pattern, n, {duck_sig6('praw')} AS pct FROM r"""


def event_paths_sql(table: str = "events", depth: int = 3,
                    key: str = "user_id", type_col: str = "event_type",
                    ts: str = "ts", id_col: str = "event_id",
                    k: int = 20) -> str:
    """Mirror of events.event_paths (same total per-user order, same
    deterministic rank ties)."""
    leads = ", ".join(
        f"lead({type_col}, {i}) OVER win AS t{i}" for i in range(1, depth))
    concat = " || '>' || ".join(f"t{i}" for i in range(depth))
    return f"""
WITH b AS (SELECT {type_col} AS t0, {leads}
           FROM {table}
           WINDOW win AS (PARTITION BY {key} ORDER BY {ts}, {id_col})),
 c AS (SELECT {concat} AS path, CAST(count(*) AS BIGINT) AS n
       FROM b WHERE t{depth - 1} IS NOT NULL GROUP BY 1)
SELECT path, n,
       CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS INTEGER)
         AS rank
FROM c
QUALIFY rank <= {k}"""


def spearman_sql(table: str, columns: list[str]) -> str:
    """Mirror of extras.spearman_matrix (same average-rank tie policy,
    same near-zero snap + sig6 as the Pearson oracle)."""
    ranks = ", ".join(
        f"rank() OVER (ORDER BY {c}) + "
        f"(count(*) OVER (PARTITION BY {c}) - 1) / 2.0 AS {c}"
        for c in columns)
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"corr({a}, {b})"
        snapped = (f"CASE WHEN {raw} IS NOT NULL AND NOT isnan({raw}) "
                   f"AND abs({raw}) < 1e-9 THEN 0.0 ELSE {raw} END")
        branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(snapped)} AS rho FROM r")
    return (f"WITH r AS (SELECT {ranks} FROM {table} WHERE {notnull})\n"
            + "\nUNION ALL\n".join(branches))


def grouped_spearman_sql(table: str, group_col: str,
                         columns: list[str]) -> str:
    """Mirror of extras.grouped_spearman (exact path): average ranks
    WITHIN each group partition — same tie policy as spearman_sql —
    then per-group corr, group rendered as VARCHAR, NaN (within-group
    constant ranks) mapped to NULL, same near-zero snap + sig6."""
    ranks = ", ".join(
        f"rank() OVER (PARTITION BY {group_col} ORDER BY {c}) + "
        f"(count(*) OVER (PARTITION BY {group_col}, {c}) - 1) / 2.0 "
        f"AS {c}"
        for c in columns)
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]
    branches = []
    for a, b in pairs:
        raw = f"corr({a}, {b})"
        snapped = (f"CASE WHEN {raw} IS NOT NULL AND isnan({raw}) "
                   f"THEN NULL "
                   f"WHEN {raw} IS NOT NULL AND abs({raw}) < 1e-9 "
                   f"THEN 0.0 ELSE {raw} END")
        branches.append(
            f"SELECT grp AS \"group\", '{a}' AS col_a, '{b}' AS col_b, "
            f"{duck_sig6(snapped)} AS rho FROM r GROUP BY grp")
    return (f"WITH r AS (SELECT CAST({group_col} AS VARCHAR) AS grp, "
            f"{ranks} FROM {table} WHERE {notnull})\n"
            + "\nUNION ALL\n".join(branches))


def hamming_calibration_md5_sql(max_hamming: int = 6, n_bands: int = 4,
                                max_bucket: int = 1024,
                                max_sample: int = 2048) -> str:
    """Mirror of the hamming_calibration_md5_documents query: 60-bit
    md5-derived signatures (the functions/hashing.py recipe, 15 hex
    chars), the same perturbation masks keyed by doc_id % 3, the
    exhaustive per-distance ground truth as an O(sample^2) self-join
    with bit_count(xor), and the banded funnel replayed literally —
    band values by shift/mask, the bucket cap as a HAVING, distinct
    candidate pairs, the exact Hamming recheck. recall through
    duck_sig6; distances with no true pairs -> NULL recall."""
    width = 64 // n_bands
    mask1 = (1 << 8) | (1 << 24) | (1 << 40) | (1 << 56)
    band_rows = ", ".join(f"({b})" for b in range(n_bands))
    recall = duck_sig6("CAST(COALESCE(f.n, 0) AS DOUBLE) / t.n")
    return f"""
WITH sig AS (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS s
             FROM documents WHERE text IS NOT NULL),
 h AS (SELECT doc_id * 2 AS id, s AS phash FROM sig
       UNION ALL
       SELECT doc_id * 2 + 1 AS id,
              xor(s, CASE WHEN doc_id % 3 = 0 THEN 3
                          WHEN doc_id % 3 = 1 THEN {mask1}
                          ELSE 30 END) AS phash FROM sig),
 samp AS (SELECT id, phash FROM h ORDER BY id LIMIT {max_sample}),
 truec AS (SELECT bit_count(xor(a.phash, b.phash)) AS d,
                  CAST(count(*) AS BIGINT) AS n
           FROM samp a JOIN samp b ON a.id < b.id
           WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
           GROUP BY 1),
 bands AS (SELECT id, phash, band,
                  (phash >> (band * {width})) & {(1 << width) - 1} AS val
           FROM samp, (VALUES {band_rows}) AS bt(band)),
 okb AS (SELECT band, val FROM bands GROUP BY band, val
         HAVING count(*) <= {max_bucket}),
 b2 AS (SELECT bands.id, bands.phash, bands.band, bands.val
        FROM bands JOIN okb USING (band, val)),
 cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                 a.phash AS pa, b.phash AS pb
          FROM b2 a JOIN b2 b
            ON a.band = b.band AND a.val = b.val AND a.id < b.id),
 found AS (SELECT bit_count(xor(pa, pb)) AS d,
                  CAST(count(*) AS BIGINT) AS n
           FROM cand WHERE bit_count(xor(pa, pb)) <= {max_hamming}
           GROUP BY 1),
 ds AS (SELECT unnest(generate_series(0, {max_hamming})) AS d)
SELECT CAST(ds.d AS INTEGER) AS hamming,
       CAST(COALESCE(t.n, 0) AS BIGINT) AS n_true_pairs,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS n_found_pairs,
       CASE WHEN COALESCE(t.n, 0) = 0 THEN NULL ELSE {recall} END
         AS recall
FROM ds LEFT JOIN truec t ON ds.d = t.d
        LEFT JOIN found f ON ds.d = f.d"""


def woe_iv_sql(table: str, feature: str, label_expr: str,
               bins: int = 10) -> str:
    """Mirror of extras.woe_iv (same histogram bucketing conventions,
    same +0.5 smoothing)."""
    return f"""
WITH mm AS (SELECT min({feature}) AS mn, max({feature}) AS mx
            FROM {table}),
 pts AS (SELECT {feature} AS x, CAST(({label_expr}) AS DOUBLE) AS y,
                mn, mx
         FROM {table} CROSS JOIN mm
         WHERE {feature} IS NOT NULL AND ({label_expr}) IS NOT NULL),
 g AS (SELECT CASE WHEN mx = mn THEN 0 ELSE
              least(CAST(floor((x - mn) / ((mx - mn) / {float(bins)}))
                    AS INTEGER), {bins - 1}) END AS bin,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS n_pos
       FROM pts GROUP BY 1),
 t AS (SELECT bin, n, n_pos,
              (n_pos + 0.5) / (sum(n_pos) OVER () + 0.5) AS ps,
              (n - n_pos + 0.5)
                / (sum(n) OVER () - sum(n_pos) OVER () + 0.5) AS ns
       FROM g)
SELECT bin, n, n_pos, {duck_sig6('ln(ps / ns)')} AS woe,
       {duck_sig6('(ps - ns) * ln(ps / ns)')} AS iv_term
FROM t"""


def seasonality_sql(table: str = "events", ts: str = "ts",
                    value: str = "value") -> str:
    """Mirror of events.seasonality_profile (ISO weekday + 1)."""
    return f"""
WITH b AS (SELECT CAST(hour({ts}) AS BIGINT) AS hour_of_day,
                  CAST(isodow({ts}) AS BIGINT) AS day_of_week,
                  CAST({value} AS DOUBLE) AS x
           FROM {table} WHERE {ts} IS NOT NULL),
 m AS (SELECT 'hour_of_day' AS dimension, hour_of_day AS bucket, x FROM b
       UNION ALL
       SELECT 'day_of_week' AS dimension, day_of_week AS bucket, x FROM b)
SELECT dimension, bucket, CAST(count(*) AS BIGINT) AS n,
       {duck_sig6('avg(x)')} AS avg_val
FROM m GROUP BY 1, 2"""


def cusum_sql(table: str = "events", key: str = "event_type",
              ts: str = "ts", value: str = "value",
              bucket_minutes: int = 360) -> str:
    """Mirror of events.cusum_changepoint (same sig6 round-trips before
    the discrete peak/threshold decisions)."""
    step = bucket_minutes * 60
    thr6 = duck_sig6("5.0 * sd")
    return f"""
WITH bu AS (SELECT {key} AS series,
                   CAST(floor(floor(epoch({ts})) / {step}) * {step}
                        AS BIGINT) AS b,
                   avg(CAST({value} AS DOUBLE)) AS m
            FROM {table}
            WHERE {ts} IS NOT NULL AND {value} IS NOT NULL
            GROUP BY 1, 2),
 st AS (SELECT series, b, m,
               avg(m) OVER (PARTITION BY series) AS mu,
               stddev_pop(m) OVER (PARTITION BY series) AS sd,
               CAST(count(*) OVER (PARTITION BY series) AS BIGINT)
                 AS n_buckets
        FROM bu),
 sc0 AS (SELECT series, b, n_buckets, sd,
                sum(m - mu) OVER (PARTITION BY series ORDER BY b
                                  ROWS UNBOUNDED PRECEDING) AS sraw
         FROM st),
 sc AS (SELECT series, b, n_buckets, sd,
               CAST(CASE WHEN CAST((sraw) AS DOUBLE) IS NULL OR isnan(CAST((sraw) AS DOUBLE)) THEN NULL WHEN CAST((sraw) AS DOUBLE) = 0 OR abs(CAST((sraw) AS DOUBLE)) < 1e-300 THEN '0e0' WHEN CAST((sraw) AS DOUBLE) > 1e300 THEN 'inf' WHEN CAST((sraw) AS DOUBLE) < -1e300 THEN '-inf' ELSE (SELECT CASE WHEN abs(m) >= 10000000       THEN printf('%de%d', CAST(m / 10 AS BIGINT), e + 1 - 6)       ELSE printf('%de%d', m, e - 6) END       FROM (SELECT e, CAST(round((CASE WHEN CAST((sraw) AS DOUBLE) IS NULL OR CAST((sraw) AS DOUBLE) = 0 OR isnan(CAST((sraw) AS DOUBLE)) OR NOT isfinite(CAST((sraw) AS DOUBLE)) OR abs(CAST((sraw) AS DOUBLE)) < 1e-300 OR abs(CAST((sraw) AS DOUBLE)) > 1e300 THEN 1.0 ELSE CAST((sraw) AS DOUBLE) * 1.0000000000009095 END) / pow(10.0, CAST(e - 6 AS DOUBLE)), 0) AS BIGINT) AS m             FROM (SELECT CAST(floor(log10(abs((CASE WHEN CAST((sraw) AS DOUBLE) IS NULL OR CAST((sraw) AS DOUBLE) = 0 OR isnan(CAST((sraw) AS DOUBLE)) OR NOT isfinite(CAST((sraw) AS DOUBLE)) OR abs(CAST((sraw) AS DOUBLE)) < 1e-300 OR abs(CAST((sraw) AS DOUBLE)) > 1e300 THEN 1.0 ELSE CAST((sraw) AS DOUBLE) * 1.0000000000009095 END)))) AS BIGINT) AS e))) END AS DOUBLE) AS s
        FROM sc0),
 pk AS (SELECT *, row_number() OVER (PARTITION BY series
                  ORDER BY abs(s) DESC, b ASC) AS rk
        FROM sc)
SELECT series, n_buckets, to_timestamp(b) AS peak_bucket_ts,
       {duck_sig6('s')} AS peak_cusum,
       {duck_sig6(f'CAST({thr6} AS DOUBLE)')} AS cusum_threshold,
       abs(s) > CAST({thr6} AS DOUBLE) AS shifted
FROM pk WHERE rk = 1"""


def js_drift_sql(table: str = "documents", column: str = "n_chars",
                 mod: int = 2, bins: int = 10) -> str:
    """Mirror of extras.js_drift (same snapshot-A bucket edges as PSI;
    zero cells contribute their one-sided half exactly, no epsilon)."""
    bucket = (f"CASE WHEN x < mn THEN -1 WHEN x > mx THEN {bins} "
              f"WHEN x >= mx THEN {bins - 1} "
              f"ELSE CAST(floor((x - mn) / w) AS INTEGER) END")
    pa = "CAST(n_a AS DOUBLE) / ta"
    pb = "CAST(n_b AS DOUBLE) / tb"
    mid = f"(({pa}) + ({pb})) / 2.0"
    term = (f"(CASE WHEN n_a > 0 THEN ({pa}) * ln(({pa}) / ({mid})) / 2.0 "
            f"ELSE 0.0 END) + "
            f"(CASE WHEN n_b > 0 THEN ({pb}) * ln(({pb}) / ({mid})) / 2.0 "
            f"ELSE 0.0 END)")
    return f"""
WITH sa AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
            WHERE doc_id % {mod} = 0 AND {column} IS NOT NULL),
sb AS (SELECT CAST({column} AS DOUBLE) AS x FROM {table}
       WHERE doc_id % {mod} = 1 AND {column} IS NOT NULL),
m AS (SELECT min(x) AS mn, max(x) AS mx,
             (max(x) - min(x)) / {float(bins)} AS w FROM sa),
ca AS (SELECT {bucket} AS bucket, count(*) AS n
       FROM sa CROSS JOIN m GROUP BY 1),
cb AS (SELECT {bucket} AS bucket, count(*) AS n
       FROM sb CROSS JOIN m GROUP BY 1),
j AS (SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
             COALESCE(ca.n, 0) AS n_a, COALESCE(cb.n, 0) AS n_b
      FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
t AS (SELECT (SELECT sum(n_a) FROM j) AS ta,
             (SELECT sum(n_b) FROM j) AS tb)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       {duck_sig6(pa)} AS pct_a, {duck_sig6(pb)} AS pct_b,
       {duck_sig6(term)} AS jsd_term
FROM j CROSS JOIN t
"""


def incremental_profile_sql(table: str, columns: list[str]) -> str:
    """Oracle for the incremental (split -> state -> merge -> finalize)
    profile: moments of the FULL table computed two-pass — if the merged
    states don't reproduce the one-shot statistics, the Pébay merge is
    wrong."""
    branches = []
    for c in columns:
        sk = duck_sig6("CASE WHEN m2 > 0 THEN m3 * sqrt(n) / m2 ** 1.5 "
                       "ELSE 0.0 END")
        ku = duck_sig6("CASE WHEN m2 > 0 THEN n * m4 / (m2 * m2) - 3.0 "
                       "ELSE 0.0 END")
        branches.append(f"""
(WITH s AS (SELECT CAST({c} AS DOUBLE) AS x FROM {table}
            WHERE {c} IS NOT NULL),
 m AS (SELECT avg(x) AS mu, CAST(count(*) AS DOUBLE) AS n,
              min(x) AS mn, max(x) AS mx FROM s),
 cm AS (SELECT any_value(n) AS n, any_value(mu) AS mu,
               any_value(mn) AS mn, any_value(mx) AS mx,
               sum((x - mu) ** 2) AS m2, sum((x - mu) ** 3) AS m3,
               sum((x - mu) ** 4) AS m4
        FROM s, m)
SELECT '{c}' AS "column", CAST(n AS BIGINT) AS n,
       {duck_sig6('mu')} AS mean, {duck_sig6('m2 / n')} AS var_pop,
       {sk} AS skewness, {ku} AS kurtosis,
       mn AS min_val, mx AS max_val
FROM cm)""")
    return "\nUNION ALL\n".join(branches)


def embedding_diversity_sql(table: str = "embeddings") -> str:
    """Mirror of similarity.embedding_diversity (same ||sum u||^2 - n
    identity over the same normalized vectors)."""
    dot = _DOT.format(a="v", b="v")
    return f"""
WITH {_norm_cte(table)},
 u AS (SELECT list_transform(v, x -> x / norm) AS uv, norm FROM n),
 t AS (SELECT CAST(count(*) AS BIGINT) AS nn, avg(norm) AS mean_norm
       FROM u),
 dims AS (SELECT d.i AS dim, sum(uv[d.i]) AS s
          FROM u CROSS JOIN
               (SELECT unnest(generate_series(1, len(uv))) AS i
                FROM (SELECT uv FROM u LIMIT 1)) d
          GROUP BY 1),
 agg AS (SELECT sum(s * s) AS s2, CAST(count(*) AS INTEGER) AS dim
         FROM dims)
SELECT t.nn AS n, agg.dim,
       CASE WHEN t.nn > 1 THEN
         {duck_sig6('(agg.s2 - t.nn) / (t.nn * (t.nn - 1))')} END
         AS mean_pairwise_cos,
       {duck_sig6('t.mean_norm')} AS mean_norm
FROM t CROSS JOIN agg"""


def embedding_drift_sql(table: str = "embeddings", mod: int = 2) -> str:
    """Mirror of similarity.embedding_drift over the vec_id%mod split."""
    dot = _DOT.format(a="v", b="v")
    cdot = _DOT.format(a="ca.c", b="cb.c")
    cself = _DOT.format(a="c", b="c")
    side = """
 n{S} AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                 sqrt({DOT}) AS norm
          FROM {T} WHERE vec_id % {MOD} = {R}),
 f{S} AS (SELECT * FROM n{S} WHERE norm > 0),
 t{S} AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(norm) AS mn
          FROM f{S}),
 d{S} AS (SELECT d.i AS dim, avg(v[d.i]) AS m
          FROM f{S} CROSS JOIN
               (SELECT unnest(generate_series(1, len(v))) AS i
                FROM (SELECT v FROM f{S} LIMIT 1)) d
          GROUP BY 1),
 c{S} AS (SELECT list(m ORDER BY dim) AS c FROM d{S})"""
    a = side.format(S="a", T=table, MOD=mod, R=0, DOT=dot)
    b = side.format(S="b", T=table, MOD=mod, R=1, DOT=dot)
    return f"""
WITH {a.lstrip()},{b}
SELECT ta.n AS n_a, tb.n AS n_b,
       {duck_sig6(f'({cdot}) / (sqrt({_DOT.format(a="ca.c", b="ca.c")}) * '
                  f'sqrt({_DOT.format(a="cb.c", b="cb.c")}))')}
         AS centroid_cos,
       {duck_sig6('ta.mn')} AS mean_norm_a,
       {duck_sig6('tb.mn')} AS mean_norm_b
FROM ta CROSS JOIN tb CROSS JOIN ca CROSS JOIN cb"""


def latest_by_key_sql(table: str = "events", key: str = "user_id",
                      ts: str = "ts", id_col: str = "event_id") -> str:
    """Mirror of events.latest_by_key (same deterministic tie order)."""
    return f"""
SELECT * EXCLUDE (rk) FROM (
  SELECT *, row_number() OVER (PARTITION BY {key}
            ORDER BY {ts} DESC, {id_col} DESC) AS rk
  FROM {table})
WHERE rk = 1"""


def pareto_share_sql(table: str = "events", key: str = "user_id",
                     value: str = "value",
                     checkpoints: tuple = (1, 5, 10, 20, 50)) -> str:
    """Mirror of events.pareto_share (same rank ties, same floor-int
    checkpoint indices)."""
    branches = []
    for pct in checkpoints:
        branches.append(f"""
SELECT {pct} AS top_pct,
  CAST(greatest(1, CAST(floor((SELECT count(*) FROM t) * {pct} / 100.0)
       AS BIGINT)) AS BIGINT) AS n_top_keys,
  (SELECT {duck_sig6('cum / (SELECT sum(v) FROM t)')} FROM r
   WHERE r = greatest(1, CAST(floor((SELECT count(*) FROM t)
        * {pct} / 100.0) AS BIGINT))) AS value_share""")
    return f"""
WITH t AS (SELECT {key} AS k, sum(CAST({value} AS DOUBLE)) AS v
           FROM {table} WHERE {value} IS NOT NULL GROUP BY 1),
 r AS (SELECT v, row_number() OVER (ORDER BY v DESC, k ASC) AS r,
              sum(v) OVER (ORDER BY v DESC, k ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
       FROM t)
""" + "\nUNION ALL\n".join(branches)


def readability_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """Mirror of text.readability (same regex classes + Flesch 1948
    constants)."""
    words = f"len({H.duck_tokens(text_col)})"
    syll = (f"len(regexp_extract_all({text_col}, "
            f"'{TX.VOWEL_GROUP_RE}'))")
    sents = (f"greatest(len(regexp_extract_all({text_col}, '[.!?]+')), 1)")
    longw = (f"len(list_filter({H.duck_tokens(text_col)}, "
             f"t -> length(t) >= 7))")
    w = f"CAST({words} AS DOUBLE)"
    sy = f"CAST({syll} AS DOUBLE)"
    se = f"CAST({sents} AS DOUBLE)"
    lw = f"CAST({longw} AS DOUBLE)"
    def guard(expr):
        return f"CASE WHEN {w} > 0 THEN {duck_sig6(expr)} END"
    return f"""
SELECT {id_col} AS id, CAST({words} AS BIGINT) AS n_words,
  CAST({syll} AS BIGINT) AS n_syllables,
  {guard(f'{w} / {se}')} AS words_per_sentence,
  {guard(f'{sy} / {w}')} AS syllables_per_word,
  {guard(f'{lw} / {w}')} AS long_word_ratio,
  {guard(f'206.835 - 1.015 * ({w} / {se}) - 84.6 * ({sy} / {w})')}
    AS flesch
FROM {table} WHERE {text_col} IS NOT NULL"""


def charset_audit_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """Mirror of text.charset_audit."""
    n = f"CAST(length({text_col}) AS BIGINT)"
    na = (f"CAST(len(regexp_extract_all({text_col}, "
          f"'{TX.NON_ASCII_RE}')) AS BIGINT)")
    ctl = (f"CAST(len(regexp_extract_all({text_col}, "
           f"'{TX.CONTROL_RE}')) AS BIGINT)")
    rp = (f"CAST(len(regexp_extract_all({text_col}, "
          f"'{chr(0xFFFD)}')) AS BIGINT)")
    ratio = f"CASE WHEN {n} > 0 THEN CAST({na} AS DOUBLE) / {n} END"
    return f"""
SELECT {id_col} AS id, {n} AS n_chars, {na} AS n_non_ascii,
  {ctl} AS n_control, {rp} AS n_replacement,
  CASE WHEN {n} > 0 THEN {duck_sig6(f'CAST({na} AS DOUBLE) / {n}')} END
    AS non_ascii_ratio,
  ({rp} > 0 OR {ctl} > 0 OR coalesce(({ratio}) > 0.3, FALSE)) AS suspect
FROM {table} WHERE {text_col} IS NOT NULL"""


def collocations_sql(table: str = "documents", text_col: str = "text",
                     min_count: int = 5, k: int = 20) -> str:
    """Mirror of text.collocations (same min_count guard, same rank on
    the sig6-rendered PMI parsed back to double)."""
    return f"""
WITH t AS (SELECT {H.duck_tokens(text_col)} AS tk FROM {table}
           WHERE {text_col} IS NOT NULL),
 bg AS (SELECT tk[u.i] AS a, tk[u.i + 1] AS b
        FROM t, LATERAL (SELECT unnest(generate_series(
               1, len(tk) - 1)) AS i) u
        WHERE len(tk) >= 2),
 bc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_pair FROM bg
        GROUP BY 1, 2 HAVING count(*) >= {min_count}),
 uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
         FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
 tot AS (SELECT (SELECT count(*) FROM bg) AS nb,
                (SELECT sum(len(tk)) FROM t) AS nt),
 sc AS (SELECT bc.a AS token_a, bc.b AS token_b, bc.n_pair,
               ua.n_w AS n_a, ub.n_w AS n_b,
               {duck_sig6('ln((CAST(bc.n_pair AS DOUBLE) / tot.nb) / '
                          '((CAST(ua.n_w AS DOUBLE) / tot.nt) * '
                          '(CAST(ub.n_w AS DOUBLE) / tot.nt)))')} AS pmi
        FROM bc JOIN uni ua ON bc.a = ua.w
                JOIN uni ub ON bc.b = ub.w
        CROSS JOIN tot)
SELECT token_a, token_b, n_pair, n_a, n_b, pmi,
       CAST(row_number() OVER (ORDER BY CAST(pmi AS DOUBLE) DESC,
            token_a ASC, token_b ASC) AS INTEGER) AS rank
FROM sc
QUALIFY rank <= {k}"""


def schema_suggestions_sql(table_expr: str, columns: list[str]) -> str:
    """Mirror of extras.schema_suggestions over the given string columns
    (same Java-strict parse SQL as the profile oracle; the table_expr may
    be a subquery — the gate stringifies typed columns on both sides)."""
    from flink_descriptive_stats_spark.functions import scalar as SC
    exprs = []
    for c in columns:
        exprs += [
            f"count({c}) AS {c}__n",
            f"count(*) FILTER (WHERE {SC.duck_parses_bool(c)}) "
            f"AS {c}__bool",
            f"count(*) FILTER (WHERE {SC.duck_parses_long(c)}) "
            f"AS {c}__long",
            f"count(*) FILTER (WHERE {SC.duck_parses_float(c)}) "
            f"AS {c}__dbl",
            f"count(*) FILTER (WHERE {SC.duck_parses_date(c)}) "
            f"AS {c}__date"]
    branches = []
    for c in columns:
        n = f"{c}__n"
        sug = (f"CASE WHEN {n} = 0 THEN 'string' "
               f"WHEN {c}__bool = {n} THEN 'boolean' "
               f"WHEN {c}__long = {n} THEN 'bigint' "
               f"WHEN {c}__dbl = {n} THEN 'double' "
               f"WHEN {c}__date = {n} THEN 'date' "
               f"ELSE 'string' END")
        best = (f"greatest({c}__bool, {c}__long, {c}__dbl, {c}__date)")
        rate = (f"CASE WHEN {n} = 0 THEN NULL "
                f"WHEN {sug} != 'string' THEN 1.0 "
                f"ELSE CAST({best} AS DOUBLE) / {n} END")
        branches.append(
            f"SELECT '{c}' AS \"column\", 'string' AS current_type, "
            f"{sug} AS suggested_type, CAST({n} AS BIGINT) AS n_non_null, "
            f"CASE WHEN {n} > 0 THEN {duck_sig6(rate)} END AS parse_rate "
            f"FROM agg")
    return (f"WITH agg AS (SELECT {', '.join(exprs)} FROM {table_expr})\n"
            + "\nUNION ALL\n".join(branches))


def check_constraints_by_sql(table: str, rules: list[tuple],
                             group_col: str) -> str:
    """Mirror of quality.check_constraints_by (same per-group fold)."""
    from flink_descriptive_stats_spark.operators.quality import rule_label
    exprs = []
    for i, r in enumerate(rules):
        kind, c = r[0], r[1]
        if kind == "not_null":
            e = f"count(CASE WHEN {c} IS NULL THEN 1 END)"
        elif kind == "unique":
            e = f"count({c}) - count(DISTINCT {c})"
        elif kind == "in_range":
            e = (f"count(CASE WHEN NOT ({c} BETWEEN {_sql_lit(r[2])} "
                 f"AND {_sql_lit(r[3])}) THEN 1 END)")
        elif kind == "matches":
            e = (f"count(CASE WHEN {c} IS NOT NULL AND NOT "
                 f"regexp_matches(CAST({c} AS VARCHAR), {_sql_lit(r[2])})"
                 f" THEN 1 END)")
        elif kind == "in_set":
            vals = ", ".join(_sql_lit(v) for v in r[2])
            e = (f"count(CASE WHEN {c} IS NOT NULL AND {c} NOT IN "
                 f"({vals}) THEN 1 END)")
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        exprs.append(f"{e} AS v{i}")
    branches = []
    for i, r in enumerate(rules):
        branches.append(
            f"SELECT \"group\", {_sql_lit(rule_label(r))} AS rule, "
            f"{_sql_lit(r[1])} AS \"column\", n AS n_rows, "
            f"CAST(v{i} AS BIGINT) AS n_violations, "
            f"v{i} = 0 AS passed FROM agg")
    return (f"WITH agg AS (SELECT {group_col} AS \"group\", "
            f"count(*) AS n, {', '.join(exprs)} FROM {table} "
            f"GROUP BY 1)\n" + "\nUNION ALL\n".join(branches))


def type_affinity_sql(table: str = "events", key: str = "user_id",
                      type_col: str = "event_type") -> str:
    """Mirror of events.type_affinity (same per-user baskets, same
    user-probability lift)."""
    return f"""
WITH ut AS (SELECT DISTINCT {key} AS k, {type_col} AS t FROM {table}),
 nu AS (SELECT CAST(count(DISTINCT k) AS DOUBLE) AS n FROM ut),
 pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
 pr AS (SELECT x.t AS type_a, y.t AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ut x JOIN ut y ON x.k = y.k AND x.t < y.t
        GROUP BY 1, 2)
SELECT pr.type_a, pr.type_b, pr.n_both,
       {duck_sig6('pr.n_both / nu.n')} AS support,
       {duck_sig6('pr.n_both * nu.n / (pa.n_t * pb.n_t)')} AS lift
FROM pr JOIN pt pa ON pr.type_a = pa.t
        JOIN pt pb ON pr.type_b = pb.t
CROSS JOIN nu"""


def histogram_log_sql(table: str, column: str, bins: int = 10) -> str:
    """Mirror of extras.histogram_log (same sig6-rounded bounds feeding
    the ln-ratio bucket index)."""
    x = f"CAST({column} AS DOUBLE)"
    mn6 = duck_sig6(f"(SELECT min({x}) FROM {table} WHERE {x} > 0)")
    mx6 = duck_sig6(f"(SELECT max({x}) FROM {table} WHERE {x} > 0)")
    return f"""
WITH m AS (SELECT CAST({mn6} AS DOUBLE) AS mn,
                  CAST({mx6} AS DOUBLE) AS mx),
 b AS (SELECT CASE WHEN {x} <= 0 THEN -1
              WHEN ln(mx) - ln(mn) <= 0 THEN 0
              ELSE least(CAST(floor((ln({x}) - ln(mn))
                   / (ln(mx) - ln(mn)) * {float(bins)}) AS INTEGER),
                   {bins - 1}) END AS bucket,
              mn, mx
       FROM {table} CROSS JOIN m WHERE {x} IS NOT NULL),
 c AS (SELECT bucket, any_value(mn) AS mn, any_value(mx) AS mx,
              CAST(count(*) AS BIGINT) AS cnt
       FROM b GROUP BY 1)
SELECT bucket,
  CASE WHEN bucket >= 0 THEN
    {duck_sig6(f'mn * pow(pow(mx / mn, 1.0 / {bins}), bucket)')} END
    AS lo,
  CASE WHEN bucket >= 0 THEN
    {duck_sig6(f'mn * pow(pow(mx / mn, 1.0 / {bins}), bucket + 1)')} END
    AS hi,
  cnt
FROM c"""


def percentile_rank_sql(table: str, column: str, id_col: str) -> str:
    """Mirror of extras.percentile_rank_transform."""
    x = f"CAST({column} AS DOUBLE)"
    return f"""
WITH r AS (SELECT {id_col} AS id, {x} AS value,
                  percent_rank() OVER (ORDER BY {x}) AS pr
           FROM {table} WHERE {x} IS NOT NULL)
SELECT id, value, {duck_sig6('pr')} AS pct_rank FROM r"""


def corpus_overlap_sql(table: str = "documents", mod: int = 2,
                       n: int = 3) -> str:
    """Mirror of dedup.corpus_overlap over the doc_id%mod halves (same
    shingle hash + whole-text fallback as the pair oracles)."""
    sh = H.duck_shingles("toks", n)
    th = H.duck_token_hash("s")
    side = """
 t{S} AS (SELECT doc_id AS id, text, {DT} AS toks FROM {T}
          WHERE text IS NOT NULL AND doc_id % {MOD} = {R}),
 s{S} AS (SELECT DISTINCT {TH} % {P} AS sh
          FROM (SELECT unnest({SH}) AS s FROM t{S}))"""
    a = side.format(S="a", T=table, MOD=mod, R=0,
                    DT=H.duck_tokens("text"), SH=sh, TH=th, P=P)
    b = side.format(S="b", T=table, MOD=mod, R=1,
                    DT=H.duck_tokens("text"), SH=sh, TH=th, P=P)
    return f"""
WITH {a.lstrip()},{b},
 ca AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sa),
 cb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sb),
 cc AS (SELECT CAST(count(*) AS BIGINT) AS n
        FROM sa JOIN sb USING (sh))
SELECT ca.n AS n_shingles_a, cb.n AS n_shingles_b, cc.n AS n_common,
  {duck_sig6('CAST(cc.n AS DOUBLE) / (ca.n + cb.n - cc.n)')} AS jaccard,
  {duck_sig6('CAST(cc.n AS DOUBLE) / ca.n')} AS containment_a_in_b
FROM ca CROSS JOIN cb CROSS JOIN cc"""


def interarrival_sql(table: str = "events", key: str = "user_id",
                     ts: str = "ts", id_col: str = "event_id") -> str:
    """Mirror of events.interarrival_profile (whole-second deltas via
    floor(epoch), same total per-user order)."""
    return f"""
WITH l AS (SELECT floor(epoch({ts})) - floor(epoch(lag({ts}) OVER (
             PARTITION BY {key} ORDER BY {ts}, {id_col}))) AS dt
           FROM {table}),
 d AS (SELECT CAST(dt AS DOUBLE) AS dt FROM l WHERE dt IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_deltas,
  {duck_sig6('avg(dt)')} AS mean_s,
  {duck_sig6('quantile_cont(dt, 0.5)')} AS p50_s,
  {duck_sig6('quantile_cont(dt, 0.9)')} AS p90_s,
  max(dt) AS max_s,
  {duck_sig6('(stddev_pop(dt) - avg(dt)) / (stddev_pop(dt) + avg(dt))')}
    AS burstiness
FROM d"""


def shared_prefix_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id", k_tokens: int = 2,
                      min_docs: int = 2) -> str:
    """Mirror of dedup.shared_prefix_groups (1-based list slice)."""
    toks = H.duck_tokens(text_col)
    return f"""
WITH p AS (SELECT array_to_string({toks}[1:{k_tokens}], ' ') AS prefix,
                  {id_col} AS id
           FROM {table} WHERE {text_col} IS NOT NULL)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(id) AS BIGINT) AS example_id
FROM p WHERE length(prefix) > 0
GROUP BY 1 HAVING count(*) >= {min_docs}"""


def late_arrival_sql(table: str = "events", seq: str = "event_id",
                     ts: str = "ts") -> str:
    """Mirror of events.late_arrival_audit (global arrival order)."""
    return f"""
WITH l AS (SELECT max(floor(epoch({ts}))) OVER (ORDER BY {seq}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
                  floor(epoch({ts})) AS t
           FROM {table}),
 d AS (SELECT CAST(greatest(pm - t, 0.0) AS DOUBLE) AS late
       FROM l WHERE pm IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(*) FILTER (WHERE late > 0) AS BIGINT) AS n_late,
  {duck_sig6('avg(CASE WHEN late > 0 THEN 1.0 ELSE 0.0 END)')}
    AS late_rate,
  max(late) AS max_lateness_s,
  {duck_sig6('quantile_cont(late, 0.99)')} AS p99_lateness_s
FROM d"""


def join_cardinality_sql(table_a: str, key_a: str, table_b: str,
                         key_b: str) -> str:
    """Mirror of joins.join_cardinality_estimate."""
    return f"""
WITH ca AS (SELECT {key_a} AS k, CAST(count(*) AS BIGINT) AS na
            FROM {table_a} WHERE {key_a} IS NOT NULL GROUP BY 1),
 cb AS (SELECT {key_b} AS k, CAST(count(*) AS BIGINT) AS nb
        FROM {table_b} WHERE {key_b} IS NOT NULL GROUP BY 1),
 j AS (SELECT ca.na, cb.nb FROM ca JOIN cb USING (k))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM {table_a}
        WHERE {key_a} IS NOT NULL) AS n_left,
       (SELECT CAST(count(*) AS BIGINT) FROM {table_b}
        WHERE {key_b} IS NOT NULL) AS n_right,
       (SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_keys_left,
       (SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_keys_right,
       CAST(coalesce(count(*), 0) AS BIGINT) AS n_keys_common,
       CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS est_rows,
       CAST(coalesce(max(na * nb), 0) AS BIGINT) AS max_key_fanout
FROM j"""


_CANON = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


def canonical_dedup_sql(table: str = "documents") -> str:
    """Mirror of dedup.canonical_dedup: group by the md5 of the canonical
    (lowercased, non-alnum runs collapsed) form."""
    return (f"SELECT {_CANON} AS canon_md5, "
            f"CAST(min(doc_id) AS BIGINT) AS rep_id, "
            f"CAST(count(*) AS BIGINT) AS dup_count, "
            f"CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_variants "
            f"FROM {table} WHERE text IS NOT NULL GROUP BY 1")


def keep_best_canonical_sql(table: str = "documents") -> str:
    """Mirror of dedup.keep_best_canonical (default score = raw length)."""
    return (f"SELECT * FROM {table} WHERE text IS NOT NULL "
            f"QUALIFY row_number() OVER (PARTITION BY {_CANON} "
            f"ORDER BY length(text) DESC, doc_id ASC) = 1")


def label_separation_sql(table: str = "embeddings") -> str:
    """Mirror of similarity.label_separation (same sig6 round-points)."""
    s = duck_sig6
    return f"""
WITH e AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                  embedding[i]::DOUBLE AS x
           FROM {table}, unnest(generate_series(1, len(embedding))) AS t(i)
           WHERE embedding IS NOT NULL),
per AS (SELECT label, dim,
               CAST({s('avg(x)')} AS DOUBLE) AS mu,
               CAST({s('avg(x * x)')} AS DOUBLE) AS msq,
               count(*) AS n
        FROM e GROUP BY label, dim),
gcent AS (SELECT dim, CAST({s('sum(mu * n) / sum(n)')} AS DOUBLE) AS g
          FROM per GROUP BY dim),
lab AS (SELECT label, max(n) AS n,
               sum(CAST({s('msq - mu * mu')} AS DOUBLE)) AS w,
               sum(CAST({s('(mu - g) * (mu - g)')} AS DOUBLE)) AS b
        FROM per JOIN gcent USING (dim) GROUP BY label)
SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n,
       {s('w')} AS within_ss, {s('b')} AS between_ss,
       {s('b / w')} AS fisher_ratio
FROM lab
"""


def windowed_quantiles_sql(table: str = "events", ts_col: str = "ts",
                           value_col: str = "value",
                           window_hours: int = 24,
                           probs=(0.25, 0.5, 0.75)) -> str:
    """Mirror of profile_stream.windowed_quantiles (exact batch path)."""
    qs = ", ".join(
        f"{duck_sig6(f'quantile_cont(CAST({value_col} AS DOUBLE), {p})')} "
        f"AS q_{int(p * 100)}" for p in probs)
    return f"""
SELECT time_bucket(INTERVAL '{window_hours} hours',
                   CAST({ts_col} AS TIMESTAMP)) AS window_start,
       time_bucket(INTERVAL '{window_hours} hours',
                   CAST({ts_col} AS TIMESTAMP))
       + INTERVAL '{window_hours} hours' AS window_end,
       CAST(count(*) AS BIGINT) AS n_rows, {qs}
FROM {table}
WHERE {ts_col} IS NOT NULL
GROUP BY 1, 2
"""


def token_fertility_sql(table: str = "documents",
                        group_col: str = "lang") -> str:
    """Mirror of text.token_fertility (same regexes, strlen = UTF-8
    bytes in DuckDB as octet_length is in Spark)."""
    toks = "len(regexp_extract_all(lower(text), '\\w+'))"
    subs = f"len(regexp_extract_all(text, '{TX.SUBWORD_RE}'))"
    return f"""
WITH g AS (SELECT {group_col} AS grp, count(*) AS n_docs,
                  sum({toks}) AS n_tokens, sum({subs}) AS n_subwords,
                  sum(length(text)) AS n_chars,
                  sum(strlen(text)) AS n_bytes
           FROM {table} WHERE text IS NOT NULL GROUP BY 1)
SELECT grp AS {group_col}, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_subwords AS BIGINT) AS n_subwords,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       {duck_sig6('n_chars / CAST(n_tokens AS DOUBLE)')} AS chars_per_token,
       {duck_sig6('n_bytes / CAST(n_tokens AS DOUBLE)')} AS bytes_per_token,
       {duck_sig6('n_subwords / CAST(n_tokens AS DOUBLE)')}
           AS subwords_per_token
FROM g
"""


def minhash_calibration_sql(table: str = "documents",
                            max_bucket: int = 1000) -> str:
    """Mirror of dedup.minhash_calibration: the same banded candidate CTEs
    as minhash_pairs_sql plus the 16-slot signature agreement fraction."""
    k = H.MINHASH_K
    agree = " + ".join(
        f"CASE WHEN sa.sig_{j} = sb.sig_{j} THEN 1 ELSE 0 END"
        for j in range(k))
    return f"""
WITH {_pairs_ctes(table, max_bucket)}
SELECT CAST(j.id_a AS BIGINT) AS id_a, CAST(j.id_b AS BIGINT) AS id_b,
       CAST(({agree}) AS DOUBLE) / {float(k)} AS est_jaccard,
       j.jaccard AS jaccard,
       abs(CAST(({agree}) AS DOUBLE) / {float(k)} - j.jaccard) AS abs_err
FROM j JOIN sw sa ON sa.id = j.id_a JOIN sw sb ON sb.id = j.id_b
"""


def cross_source_dups_sql(table: str = "documents") -> str:
    """Mirror of dedup.cross_source_dups."""
    return f"""
WITH hs AS (SELECT DISTINCT md5(text) AS h, source AS src
            FROM {table} WHERE text IS NOT NULL)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM hs a JOIN hs b ON a.h = b.h AND a.src < b.src
GROUP BY 1, 2
"""


def join_advisor_sql(table_a: str, key_a: str, table_b: str, key_b: str,
                     broadcast_max: int = 100_000,
                     skew_ratio: float = 20.0) -> str:
    """Mirror of joins.join_advisor: the cardinality audit + the same
    deterministic rule CASE."""
    return f"""
WITH base AS ({join_cardinality_sql(table_a, key_a, table_b, key_b)})
SELECT *,
       CASE WHEN n_right <= {broadcast_max} THEN 'broadcast(right)'
            WHEN n_left <= {broadcast_max} THEN 'broadcast(left)'
            WHEN n_keys_common > 0 AND est_rows > 0
                 AND max_key_fanout
                     > {skew_ratio} * (CAST(est_rows AS DOUBLE)
                                       / n_keys_common)
                 THEN 'salted_shuffle'
            ELSE 'sort_merge_shuffle' END AS strategy,
       CASE WHEN est_rows > 0 THEN {duck_sig6(
           'CAST(max_key_fanout AS DOUBLE) / est_rows')}
            ELSE NULL END AS skew_key_share
FROM base"""


def label_purity_sql(table: str = "embeddings", n_cells: int = 16) -> str:
    """Mirror of similarity.label_purity: the seed-cell crank=1
    assignment CTE (as semdedup_sql) + per-cell label distribution."""
    cdot = _DOT.format(a="n.v", b="cent.cv")
    return f"""
WITH {_norm_cte(table)},
cent AS (SELECT id AS cell_id, v AS cv, norm AS cnorm FROM n
         WHERE id < {n_cells}),
sc AS (SELECT n.id, cent.cell_id,
              row_number() OVER (PARTITION BY n.id
                ORDER BY ({cdot}) / (n.norm * cent.cnorm) DESC,
                         cent.cell_id ASC) AS crank
       FROM n CROSS JOIN cent),
a AS (SELECT id, cell_id FROM sc WHERE crank = 1),
cl AS (SELECT a.cell_id, e.label, count(*) AS cnt
       FROM a JOIN {table} e ON e.vec_id = a.id GROUP BY 1, 2),
t AS (SELECT *, sum(cnt) OVER (PARTITION BY cell_id) AS ncell,
             row_number() OVER (PARTITION BY cell_id
               ORDER BY cnt DESC, label ASC) AS rk
      FROM cl),
g AS (SELECT cell_id, max(ncell) AS n,
             max(CASE WHEN rk = 1 THEN label END) AS majority_label,
             max(CASE WHEN rk = 1
                 THEN CAST(cnt AS DOUBLE) / ncell END) AS pur,
             sum(-(CAST(cnt AS DOUBLE) / ncell)
                 * ln(CAST(cnt AS DOUBLE) / ncell)) AS ent
      FROM t GROUP BY 1)
SELECT CAST(cell_id AS BIGINT) AS cell_id, CAST(n AS BIGINT) AS n,
       CAST(majority_label AS BIGINT) AS majority_label,
       {duck_sig6('pur')} AS purity, {duck_sig6('ent')} AS label_entropy
FROM g"""


def dup_rate_by_source_sql(table: str = "documents") -> str:
    """Mirror of dedup.dup_rate_by_source."""
    return f"""
WITH d AS (SELECT source, md5(text) AS h, {_CANON} AS c
           FROM {table} WHERE text IS NOT NULL),
g AS (SELECT source, count(*) AS n_docs,
             count(DISTINCT h) AS n_unique_exact,
             count(DISTINCT c) AS n_unique_canonical
      FROM d GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_unique_exact AS BIGINT) AS n_unique_exact,
       CAST(n_unique_canonical AS BIGINT) AS n_unique_canonical,
       {duck_sig6('1.0 - n_unique_exact / CAST(n_docs AS DOUBLE)')}
           AS exact_dup_rate,
       {duck_sig6('1.0 - n_unique_canonical / CAST(n_docs AS DOUBLE)')}
           AS canonical_dup_rate
FROM g"""


def temporal_split_sql(table: str = "events",
                       holdout_frac: float = 0.1,
                       cut: float | None = None) -> str:
    """Mirror of sampling.temporal_split; ``cut`` is the sig6-rounded
    epoch-seconds cutoff computed by the Spark side (inlined so both
    engines compare against the identical literal — the Spark operator
    does exactly this with its own collected percentile)."""
    e = "epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0"
    if cut is None:
        q6 = duck_sig6(f"quantile_cont({e}, {1.0 - holdout_frac})")
        cond = (f"{e} >= (SELECT CAST({q6} AS DOUBLE) FROM {table})")
    else:
        cond = f"{e} >= {cut!r}"
    return (f"SELECT *, CASE WHEN {cond} THEN 'holdout' ELSE 'train' END "
            f"AS split FROM {table}")


def k_anonymity_sql(table: str, quasi_cols: list[str], k: int = 5) -> str:
    """Mirror of quality.k_anonymity."""
    keys = ", ".join(quasi_cols)
    return f"""
WITH g AS (SELECT {keys}, count(*) AS n FROM {table} GROUP BY {keys}),
a AS (SELECT sum(n) AS n_rows, count(*) AS n_groups,
             count(*) FILTER (n < {k}) AS n_groups_below_k,
             coalesce(sum(n) FILTER (n < {k}), 0) AS n_rows_below_k,
             min(n) AS min_group_size
      FROM g)
SELECT CAST({k} AS BIGINT) AS k, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_groups_below_k AS BIGINT) AS n_groups_below_k,
       CAST(n_rows_below_k AS BIGINT) AS n_rows_below_k,
       CAST(min_group_size AS BIGINT) AS min_group_size,
       {duck_sig6('n_rows_below_k / CAST(n_rows AS DOUBLE)')}
           AS at_risk_rate
FROM a"""


def quality_ensemble_sql(table: str = "documents") -> str:
    """Mirror of quality.quality_ensemble: the three gated signal
    queries as CTEs, identical rank windows (id tie-break makes every
    rank unique, so tie semantics cannot diverge)."""
    s = duck_sig6
    return f"""
WITH qs AS ({text_stats_sql(table)}),
lms AS ({lm_score_sql(table)}),
dups AS ({duplicated_ngram_fraction_sql(table)}),
j AS (SELECT qs.id AS doc_id,
             CAST(qs.quality_score AS DOUBLE) AS q,
             CAST(lms.lm_score AS DOUBLE) AS lm,
             dups.dup_fraction AS dup
      FROM qs JOIN lms ON lms.doc_id = qs.id
              JOIN dups ON dups.doc_id = qs.id),
r AS (SELECT doc_id,
             percent_rank() OVER (ORDER BY q ASC, doc_id ASC) AS rq,
             percent_rank() OVER (ORDER BY lm DESC, doc_id ASC) AS rl,
             percent_rank() OVER (ORDER BY dup DESC, doc_id ASC) AS rd
      FROM j)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {s('rq')} AS q_rank,
       {s('rl')} AS lm_rank, {s('rd')} AS dup_rank,
       {s('(rq + rl + rd) / 3.0')} AS ensemble
FROM r"""


def dataset_card_sql(table: str = "documents") -> str:
    """Mirror of quality.dataset_card: the component mirrors as CTEs,
    each card row a one-value aggregate, counts cast to VARCHAR and
    fractions through duck_sig6 — the same rendering split the Spark
    side uses, so the mixed-type value column compares exactly."""
    from flink_descriptive_stats_spark.operators.text import PII_PATTERNS
    s = duck_sig6
    pii_total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))"
        for _, pat in PII_PATTERNS)
    return f"""
WITH ts AS ({text_stats_sql(table)}),
li AS ({lang_id_sql(table)}),
d AS (SELECT * FROM {table} WHERE text IS NOT NULL),
base AS (SELECT count(*) AS n, count(DISTINCT md5(text)) AS cd,
                count(DISTINCT {_CANON}) AS cc,
                count(DISTINCT source) AS ns FROM d),
tsa0 AS (SELECT sum(n_tokens) AS ntok, sum(n_chars) AS nch,
                avg(CAST(quality_score AS DOUBLE)) AS mq_raw,
                CAST(count(*) FILTER (CAST(quality_score AS DOUBLE)
                  < 0.5) AS DOUBLE) / count(*) AS lowq_raw,
                quantile_cont(CAST(n_tokens AS DOUBLE), 0.5) AS med_raw
         FROM ts),
tsa AS (SELECT ntok, nch, {s('mq_raw')} AS mq, {s('lowq_raw')} AS lowq,
               {s('med_raw')} AS med FROM tsa0),
smax AS (SELECT max(c) AS mx FROM
           (SELECT count(*) AS c FROM d GROUP BY source)),
lc AS (SELECT predicted_lang AS lang, count(*) AS c FROM li GROUP BY 1),
ltop AS (SELECT lang, c FROM lc ORDER BY c DESC, lang ASC LIMIT 1),
nl AS (SELECT count(*) AS k FROM lc),
pii AS (SELECT count(*) FILTER (({pii_total}) > 0) AS p FROM d)
SELECT 'corpus' AS section, 'n_docs' AS metric,
       CAST(n AS VARCHAR) AS value FROM base
UNION ALL SELECT 'corpus', 'n_sources', CAST(ns AS VARCHAR) FROM base
UNION ALL SELECT 'corpus', 'n_tokens',
       CAST(CAST(ntok AS BIGINT) AS VARCHAR) FROM tsa
UNION ALL SELECT 'corpus', 'n_chars',
       CAST(CAST(nch AS BIGINT) AS VARCHAR) FROM tsa
UNION ALL SELECT 'corpus', 'max_source_share',
       {s('CAST(smax.mx AS DOUBLE) / base.n')} FROM smax, base
UNION ALL SELECT 'dedup', 'exact_dup_fraction',
       {s('1.0 - CAST(cd AS DOUBLE) / n')} FROM base
UNION ALL SELECT 'dedup', 'canonical_dup_fraction',
       {s('1.0 - CAST(cc AS DOUBLE) / n')} FROM base
UNION ALL SELECT 'quality', 'mean_quality', mq FROM tsa
UNION ALL SELECT 'quality', 'low_quality_fraction', lowq FROM tsa
UNION ALL SELECT 'quality', 'median_tokens', med FROM tsa
UNION ALL SELECT 'lang', 'top_lang', lang FROM ltop
UNION ALL SELECT 'lang', 'top_lang_share',
       {s('CAST(ltop.c AS DOUBLE) / base.n')} FROM ltop, base
UNION ALL SELECT 'lang', 'n_langs', CAST(k AS VARCHAR) FROM nl
UNION ALL SELECT 'pii', 'pii_doc_fraction',
       {s('CAST(p AS DOUBLE) / base.n')} FROM pii, base"""


def dataset_card_approx_stable_sql(table: str = "documents") -> str:
    """Mirror of the dataset_card(exact=False) gate (r13, VERDICT r12
    missing #1): the approx card's DETERMINISTIC rows are identical by
    construction to the exact card's, so the oracle is dataset_card_sql
    minus quality.CARD_SKETCHED_METRICS — the same constant the Spark
    side filters on, so the two sides cannot drift."""
    from flink_descriptive_stats_spark.operators.quality import \
        CARD_SKETCHED_METRICS
    skip = ", ".join(f"'{m}'" for m in CARD_SKETCHED_METRICS)
    return (f"SELECT section, metric, value FROM (\n"
            f"{dataset_card_sql(table)}\n"
            f") __card WHERE metric NOT IN ({skip})")


def dataset_card_by_source_sql(table: str = "documents") -> str:
    """Mirror of quality.dataset_card_by_source: the same per-source
    grouped aggregates, per-source top language via QUALIFY, identical
    value rendering."""
    from flink_descriptive_stats_spark.operators.text import PII_PATTERNS
    s = duck_sig6
    pii_total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))"
        for _, pat in PII_PATTERNS)
    return f"""
WITH ts AS ({text_stats_sql(table)}),
li AS ({lang_id_sql(table)}),
d AS (SELECT * FROM {table} WHERE text IS NOT NULL),
p1 AS (SELECT source, count(*) AS n,
              count(DISTINCT md5(text)) AS cd FROM d GROUP BY 1),
p2r AS (SELECT d.source, sum(ts.n_tokens) AS ntok,
               avg(CAST(ts.quality_score AS DOUBLE)) AS mq_raw,
               CAST(count(*) FILTER (CAST(ts.quality_score AS DOUBLE)
                 < 0.5) AS DOUBLE) / count(*) AS lowq_raw
        FROM ts JOIN d ON d.doc_id = ts.id GROUP BY 1),
p2 AS (SELECT source, ntok, {s('mq_raw')} AS mq,
              {s('lowq_raw')} AS lowq FROM p2r),
lt AS (SELECT d.source, li.predicted_lang AS lang, count(*) AS c
       FROM li JOIN d ON d.doc_id = li.id GROUP BY 1, 2
       QUALIFY row_number() OVER (PARTITION BY d.source
         ORDER BY count(*) DESC, li.predicted_lang ASC) = 1),
p4 AS (SELECT source,
              count(*) FILTER (({pii_total}) > 0) AS p
       FROM d GROUP BY 1)
SELECT source, 'n_docs' AS metric, CAST(n AS VARCHAR) AS value FROM p1
UNION ALL SELECT source, 'n_tokens',
       CAST(CAST(ntok AS BIGINT) AS VARCHAR) FROM p2
UNION ALL SELECT source, 'exact_dup_fraction',
       {s('1.0 - CAST(cd AS DOUBLE) / n')} FROM p1
UNION ALL SELECT source, 'mean_quality', mq FROM p2
UNION ALL SELECT source, 'low_quality_fraction', lowq FROM p2
UNION ALL SELECT source, 'top_lang', lang FROM lt
UNION ALL SELECT p4.source, 'pii_doc_fraction',
       {s('CAST(p4.p AS DOUBLE) / p1.n')} FROM p4 JOIN p1 USING (source)"""


def curate_corpus_sql(table: str = "documents",
                      holdout_pred: str = "doc_id % 10 = 0",
                      min_score: float = 0.5, cap: int = 10) -> str:
    """Mirror of quality.curate_corpus with train = NOT holdout_pred and
    holdout = holdout_pred over ``table`` (the gated split). NOT EXISTS
    (not NOT IN) for the decontamination anti-join — NULL-safe on both
    engines."""
    return f"""
WITH train AS (SELECT * FROM {table} WHERE NOT ({holdout_pred})),
kb AS (SELECT * FROM train WHERE text IS NOT NULL
       QUALIFY row_number() OVER (PARTITION BY {_CANON}
         ORDER BY length(text) DESC, doc_id ASC) = 1),
dec AS (SELECT kb.* FROM kb WHERE NOT EXISTS (
          SELECT 1 FROM {table} h
          WHERE ({holdout_pred.replace('doc_id', 'h.doc_id')})
            AND h.text IS NOT NULL AND md5(h.text) = md5(kb.text))),
qf AS (SELECT d.* FROM dec d WHERE d.doc_id IN
         (SELECT id FROM ({text_stats_sql('dec')})
          WHERE CAST(quality_score AS DOUBLE) >= {min_score}))
SELECT * FROM qf QUALIFY row_number() OVER (PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {cap}"""


def curate_corpus_lines_sql(table: str = "documents",
                            holdout_pred: str = "doc_id % 10 = 0",
                            min_score: float = 0.5,
                            cap: int = 10) -> str:
    """Mirror of the r12 line-dedup-aware quality.curate_corpus: the
    nav-line fixture planted on the BASE frame (both splits), the
    dedup_lines rewrite applied to BOTH sides (the clean=True symmetry
    contract), then the standard keep-best / decontaminate / quality /
    strata-cap chain — stage order replayed literally."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    nav, m = DD.LINE_NAV, DD.LINE_NAV_MOD
    nl = "chr(10)"
    # the rewrite mirror carries the operator's FULL default contract,
    # including the r13 DEDUP_MAX_LINES degenerate-page guard that
    # dedup_lines_rewrite applies inside curate_corpus (r13 self-review
    # #1: this second mirror had silently missed it)
    ld = ("CASE WHEN text IS NULL THEN NULL "
          f"WHEN len(string_split(text, {nl})) > {DD.DEDUP_MAX_LINES} "
          "THEN text "
          "ELSE array_to_string("
          f"list_filter(string_split(text, {nl}), (x, i) -> "
          "trim(x) = '' OR "
          f"list_position(string_split(text, {nl}), x) = i), {nl}) END")
    hp = holdout_pred.replace("doc_id", "h.doc_id")
    return f"""
WITH base0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {m} = 0
              THEN '{nav}' || {nl} || text || {nl} || '{nav}'
                   || {nl} || {nl} || '{nav}'
              ELSE text || {nl} || '{nav}' END AS text,
         lang, source, n_chars
  FROM {table}),
base AS (SELECT doc_id, {ld} AS text, lang, source, n_chars
         FROM base0),
train AS (SELECT * FROM base WHERE NOT ({holdout_pred})),
kb AS (SELECT * FROM train WHERE text IS NOT NULL
       QUALIFY row_number() OVER (PARTITION BY {_CANON}
         ORDER BY length(text) DESC, doc_id ASC) = 1),
dec AS (SELECT kb.* FROM kb WHERE NOT EXISTS (
          SELECT 1 FROM base h
          WHERE ({hp}) AND h.text IS NOT NULL
            AND md5(h.text) = md5(kb.text))),
qf AS (SELECT d.* FROM dec d WHERE d.doc_id IN
         (SELECT id FROM ({text_stats_sql('dec')})
          WHERE CAST(quality_score AS DOUBLE) >= {min_score}))
SELECT * FROM qf QUALIFY row_number() OVER (PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {cap}"""


def curate_corpus_spans_sql(table: str = "documents",
                            holdout_pred: str = "doc_id % 10 = 0",
                            min_score: float = 0.5, cap: int = 10,
                            min_ngram: int = 5,
                            min_df: int = 25) -> str:
    """Mirror of the r11 span-aware quality.curate_corpus: the
    boilerplate fixture planted on the BASE frame (both the train and
    holdout splits see it, keeping decontamination symmetric), then
    keep-best canonical dedup, exact decontamination, the despan stage
    (the sp_ CTE chain — remove_repeated_spans' full contract — run on
    the deduped, decontaminated train corpus, text REPLACEd in place),
    the quality filter over the DESPANNED text, and the strata cap —
    stage order replayed literally."""
    from flink_descriptive_stats_spark.operators import dedup as DD
    hdr, ftr = DD.SPAN_HEADER, DD.SPAN_FOOTER
    hm, fm = DD.SPAN_HEADER_MOD, DD.SPAN_FOOTER_MOD
    hp = holdout_pred.replace("doc_id", "h.doc_id")
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {fm} = 0 THEN t0 || '  {ftr}'
              ELSE t0 END AS text, lang, source, n_chars
  FROM (SELECT *, CASE WHEN doc_id % {hm} <> {hm - 1}
                       THEN '{hdr} ' || text ELSE text END AS t0
        FROM {table})),
train AS (SELECT * FROM base WHERE NOT ({holdout_pred})),
kb AS (SELECT * FROM train WHERE text IS NOT NULL
       QUALIFY row_number() OVER (PARTITION BY {_CANON}
         ORDER BY length(text) DESC, doc_id ASC) = 1),
dec AS (SELECT kb.* FROM kb WHERE NOT EXISTS (
          SELECT 1 FROM base h
          WHERE ({hp}) AND h.text IS NOT NULL
            AND md5(h.text) = md5(kb.text))),
sp_docsrc AS (SELECT doc_id AS id, text FROM dec),
{_span_ctes("sp_docsrc", int(min_ngram), int(min_df))},
desp AS (SELECT dec.* REPLACE (s.text_clean AS text)
         FROM dec JOIN spanfinal s ON s.id = dec.doc_id),
qf AS (SELECT d.* FROM desp d WHERE d.doc_id IN
         (SELECT id FROM ({text_stats_sql('desp')})
          WHERE CAST(quality_score AS DOUBLE) >= {min_score}))
SELECT * FROM qf QUALIFY row_number() OVER (PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {cap}"""


def curate_corpus_url_sql(table: str = "documents",
                          holdout_pred: str = "doc_id % 10 = 0",
                          min_score: float = 0.5, cap: int = 10,
                          max_per_domain: int = 10) -> str:
    """Mirror of the r10 url-aware quality.curate_corpus: the four-stage
    chain of curate_corpus_sql plus URL decontamination (canonical-key
    anti-join, NOT EXISTS) after the content one and the per-domain cap
    (row_number, domain-less rows kept) after the quality filter,
    before the strata cap — stage order replayed literally."""
    from flink_descriptive_stats_spark.operators import urls as U
    hp = holdout_pred.replace("doc_id", "h.doc_id")
    canon_h = _duck_canonical_url("h.url")
    canon_d = _duck_canonical_url("dec.url")
    raw_host = f"nullif(regexp_extract(url, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    domain = f"nullif(regexp_extract({host}, '{U.DOMAIN_RE}', 1), '')"
    return f"""
WITH base AS (SELECT *, {_synth_url_case()} AS url FROM {table}),
train AS (SELECT * FROM base WHERE NOT ({holdout_pred})),
kb AS (SELECT * FROM train WHERE text IS NOT NULL
       QUALIFY row_number() OVER (PARTITION BY {_CANON}
         ORDER BY length(text) DESC, doc_id ASC) = 1),
dec0 AS (SELECT kb.* FROM kb WHERE NOT EXISTS (
          SELECT 1 FROM base h
          WHERE ({hp})
            AND h.text IS NOT NULL AND md5(h.text) = md5(kb.text))),
dec AS (SELECT dec.* FROM dec0 dec WHERE NOT EXISTS (
          SELECT 1 FROM base h
          WHERE ({hp}) AND h.url IS NOT NULL
            AND {canon_h} = {canon_d})),
qf AS (SELECT d.* FROM dec d WHERE d.doc_id IN
         (SELECT id FROM ({text_stats_sql('dec')})
          WHERE CAST(quality_score AS DOUBLE) >= {min_score})),
capd AS (SELECT * FROM (
           SELECT qf.*, {domain} AS __dom,
                  row_number() OVER (PARTITION BY {domain}
                    ORDER BY doc_id) AS __rn
           FROM qf)
         WHERE __dom IS NULL OR __rn <= {max_per_domain})
SELECT * EXCLUDE (__dom, __rn) FROM capd
QUALIFY row_number() OVER (PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {cap}"""


def vocab_growth_sql(table: str = "documents",
                     bucket_docs: int = 50) -> str:
    """Mirror of text.vocab_growth."""
    return f"""
WITH t AS (SELECT DISTINCT doc_id AS id, unnest(
             regexp_extract_all(lower(text), '\\w+')) AS tok
           FROM {table} WHERE text IS NOT NULL),
f AS (SELECT tok, min(id) AS first_doc FROM t GROUP BY tok),
b AS (SELECT CAST(floor(first_doc / {bucket_docs}) AS BIGINT) AS bucket,
             count(*) AS n_new_tokens, min(first_doc) AS first_doc
      FROM f GROUP BY 1)
SELECT bucket, CAST(first_doc AS BIGINT) AS first_doc,
       CAST(n_new_tokens AS BIGINT) AS n_new_tokens,
       CAST(sum(n_new_tokens) OVER (ORDER BY bucket
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM b"""


def incremental_dedup_report_sql(old_pred: str, new_pred: str,
                                 table: str = "documents") -> str:
    """Mirror of dedup.incremental_dedup_report over one table split by
    predicates (the gated form)."""
    return f"""
WITH oldh AS (SELECT DISTINCT md5(text) AS h FROM {table}
              WHERE ({old_pred}) AND text IS NOT NULL),
d AS (SELECT source, md5(text) AS h FROM {table}
      WHERE ({new_pred}) AND text IS NOT NULL),
ph AS (SELECT d.source, d.h, count(*) AS n,
              EXISTS (SELECT 1 FROM oldh WHERE oldh.h = d.h) AS in_old
       FROM d GROUP BY 1, 2)
SELECT source, CAST(sum(n) AS BIGINT) AS n_new,
       CAST(coalesce(sum(n) FILTER (in_old), 0) AS BIGINT)
           AS n_dup_of_old,
       CAST(coalesce(sum(n - 1) FILTER (NOT in_old), 0) AS BIGINT)
           AS n_internal_dup,
       CAST(count(*) FILTER (NOT in_old) AS BIGINT) AS n_novel
FROM ph GROUP BY 1"""


def dedup_corpus_keep_best_sql(table: str = "documents",
                               threshold: float = 0.5) -> str:
    """Mirror of dedup.dedup_corpus_keep_best: cluster CTEs + quality
    argmax per cluster."""
    return (f"WITH RECURSIVE {_cluster_ctes(table, threshold)}, "
            f"sc AS ({text_stats_sql(table)}), "
            f"best AS (SELECT lab.id FROM lab JOIN sc ON sc.id = lab.id "
            f"QUALIFY row_number() OVER (PARTITION BY lab.cluster_id "
            f"ORDER BY CAST(sc.quality_score AS DOUBLE) DESC, "
            f"lab.id ASC) = 1) "
            f"SELECT t.* FROM {table} t JOIN best ON t.doc_id = best.id")


def key_candidates_sql(table: str, columns: list[str]) -> str:
    """Mirror of extras.key_candidates."""
    branches = []
    for c in columns:
        u = f"count(DISTINCT {c}) / CAST(count({c}) AS DOUBLE)"
        branches.append(
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) "
            f"AS n_rows, CAST(count({c}) AS BIGINT) AS n_non_null, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CASE WHEN count({c}) > 0 THEN {duck_sig6(u)} END "
            f"AS uniqueness, "
            f"count({c}) = count(*) AND count(DISTINCT {c}) = count(*) "
            f"AS is_key FROM {table}")
    return " UNION ALL ".join(branches)


def fuzzy_key_join_sql(left_expr: str, right_expr: str,
                       max_dist: int = 1, max_key_len: int = 48) -> str:
    """Mirror of joins.fuzzy_key_join: the ORACLE runs the exhaustive
    O(n*m) levenshtein cross join the SymSpell blocking must reproduce
    exactly (same spec-vs-blocking relationship as typo_pairs) — under
    the SAME documented key-length contract: a pair at dist >= 1 is in
    scope only when BOTH keys are <= max_key_len chars (over-length
    keys are exact-match-only in the operator, so the spec carries the
    identical cutoff; dist = 0 matches are always found)."""
    return f"""
WITH la AS (SELECT DISTINCT lower(CAST(k AS VARCHAR)) AS k
            FROM ({left_expr}) t(k) WHERE k IS NOT NULL),
rb AS (SELECT DISTINCT lower(CAST(k AS VARCHAR)) AS k
       FROM ({right_expr}) t(k) WHERE k IS NOT NULL)
SELECT la.k AS key_left, rb.k AS key_right,
       levenshtein(la.k, rb.k) AS dist
FROM la CROSS JOIN rb
WHERE levenshtein(la.k, rb.k) <= {max_dist}
  AND (la.k = rb.k OR (length(la.k) <= {max_key_len}
                       AND length(rb.k) <= {max_key_len}))"""


# --------------------------------------------------------------------------
# markup / text extraction (operators/markup.py)
# --------------------------------------------------------------------------

def _synth_html_case(text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """The shared HTML-fixture shell as a DuckDB CASE expression — the
    SQL twin of markup.synth_html_expr, built from the SAME
    HTML_VARIANTS literals (asserted quote/backslash-free there), so
    the two sides cannot drift."""
    from flink_descriptive_stats_spark.operators import markup as MK
    whens = []
    for i, (pre, post) in enumerate(MK.HTML_VARIANTS):
        assert "'" not in pre + post and "\\" not in pre + post
        whens.append(f"WHEN {i} THEN '{pre}' || {text_expr} || '{post}'")
    return (f"CASE CAST({id_expr} AS BIGINT) % {len(MK.HTML_VARIANTS)} "
            + " ".join(whens) + " END")


def _duck_extract_text(expr: str) -> str:
    """markup.extract_text_expr mirrored step by step: the same regex
    constants (Java/RE2 common subset), the same entity order, the
    same whitespace collapse."""
    from flink_descriptive_stats_spark.operators import markup as MK
    x = expr
    for pat in (MK.COMMENT_RE, MK.SCRIPT_RE, MK.STYLE_RE, MK.NAV_RE,
                MK.TAG_RE):
        x = f"regexp_replace({x}, '{pat}', ' ', 'g')"
    for ent, ch in MK.ENTITIES:
        x = f"replace({x}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


def extract_text_sql(table: str = "documents") -> str:
    return f"""
WITH h AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_html_case()} AS html
           FROM {table} WHERE text IS NOT NULL)
SELECT id, {_duck_extract_text('html')} AS text_extracted FROM h"""


def markup_density_sql(table: str = "documents") -> str:
    from flink_descriptive_stats_spark.operators import markup as MK
    dens = ("CASE WHEN length(html) > 0 THEN 1.0 - "
            f"CAST(length({_duck_extract_text('html')}) AS DOUBLE) / "
            "CAST(length(html) AS DOUBLE) ELSE 0.0 END")
    return f"""
WITH h AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_html_case()} AS html
           FROM {table} WHERE text IS NOT NULL)
SELECT id, CAST(length(html) AS BIGINT) AS raw_len,
       CAST(length({_duck_extract_text('html')}) AS BIGINT)
         AS extracted_len,
       {duck_sig6(dens)} AS markup_density,
       CAST(len(regexp_extract_all(html, '{MK.TAG_RE}')) AS BIGINT)
         AS n_tags,
       CAST(len(regexp_extract_all(html, '{MK.LINK_RE}')) AS BIGINT)
         AS n_links,
       CAST(len(regexp_extract_all(html, '{MK.SCRIPT_RE}')) AS BIGINT)
         AS n_scripts
FROM h"""


def extracted_text_stats_sql(table: str = "documents") -> str:
    """text_stats over the extraction output — the end-to-end crawl
    composition: the inner derived table rebuilds the markup shells and
    extracts inline; text_stats_sql's own CTE then tokenizes the
    EXTRACTED text, so the oracle replays both stages and their
    interaction."""
    inner = (f"(SELECT doc_id, "
             f"{_duck_extract_text(_synth_html_case())} AS text "
             f"FROM {table} WHERE text IS NOT NULL)")
    return text_stats_sql(inner)


# --------------------------------------------------------------------------
# URL / domain analysis (operators/urls.py)
# --------------------------------------------------------------------------

def _synth_url_case(id_expr: str = "doc_id") -> str:
    """The shared URL-fixture shells as a DuckDB CASE expression — the
    SQL twin of urls.synth_url_expr, built from the SAME URL_VARIANTS
    literals."""
    from flink_descriptive_stats_spark.operators import urls as U
    whens = []
    for i, base in enumerate(U.URL_VARIANTS):
        assert "'" not in base and "\\" not in base
        whens.append(
            f"WHEN {i} THEN '{base}' || CAST({id_expr} AS VARCHAR)")
    return (f"CASE CAST({id_expr} AS BIGINT) % {len(U.URL_VARIANTS)} "
            + " ".join(whens) + " END")


def url_components_sql(table: str = "documents") -> str:
    """urls.url_components mirrored expression by expression (same
    regex constants, same NULL/empty handling, same port-strip-then-
    lowercase order, same depth guard on invalid rows)."""
    from flink_descriptive_stats_spark.operators import urls as U
    scheme = f"nullif(regexp_extract(url, '{U.SCHEME_RE}', 1), '')"
    raw_host = f"nullif(regexp_extract(url, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    path = f"nullif(regexp_extract(url, '{U.PATH_RE}', 1), '')"
    depth = (f"CASE WHEN {scheme} IS NULL THEN NULL ELSE "
             f"CAST(len(list_filter(string_split(coalesce({path}, ''), "
             f"'/'), x -> x <> '')) AS BIGINT) END")
    return f"""
WITH u AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_url_case()} AS url
           FROM {table} WHERE text IS NOT NULL)
SELECT id,
       {scheme} IS NOT NULL AS valid,
       {scheme} AS scheme,
       {host} AS host,
       nullif(regexp_extract({host}, '{U.DOMAIN_RE}', 1), '') AS domain,
       nullif(regexp_extract({host}, '{U.TLD_RE}', 1), '') AS tld,
       {depth} AS path_depth,
       CASE WHEN {scheme} IS NULL THEN NULL
            ELSE contains(url, '?') END AS has_query
FROM u"""


def domain_mix_sql(table: str = "documents") -> str:
    from flink_descriptive_stats_spark.operators import urls as U
    raw_host = f"nullif(regexp_extract(url, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    return f"""
WITH u AS (SELECT {_synth_url_case()} AS url
           FROM {table} WHERE text IS NOT NULL),
d AS (SELECT nullif(regexp_extract({host}, '{U.DOMAIN_RE}', 1), '')
        AS domain FROM u),
c AS (SELECT domain, count(*) AS n_docs FROM d
      WHERE domain IS NOT NULL GROUP BY domain),
r AS (SELECT domain, n_docs, CAST(n_docs AS DOUBLE)
        / CAST(sum(n_docs) OVER () AS DOUBLE) AS sh FROM c)
SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
       {duck_sig6("sh")} AS share
FROM r"""


def _duck_canonical_url(u: str = "url") -> str:
    """urls.canonical_url_expr mirrored: scheme/case/port/www/query-
    insensitive page identity; scheme-less URLs key on the raw
    string."""
    from flink_descriptive_stats_spark.operators import urls as U
    scheme = f"nullif(regexp_extract({u}, '{U.SCHEME_RE}', 1), '')"
    raw_host = f"nullif(regexp_extract({u}, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    host = f"regexp_replace({host}, '^www[.]', '')"
    path = f"nullif(regexp_extract({u}, '{U.PATH_RE}', 1), '')"
    return (f"CASE WHEN {scheme} IS NULL THEN {u} "
            f"ELSE {host} || coalesce({path}, '/') END")


def url_decontaminate_sql(table: str = "documents",
                          holdout_mod: int = 5) -> str:
    """urls.decontaminate_by_url mirrored: the holdout is every
    (id %% holdout_mod == 0) doc with its fixture URL re-schemed
    https->http (proving scheme-insensitivity rides the gate, not just
    pytest); anti-join on the canonical key."""
    return f"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_url_case()} AS url
           FROM {table} WHERE text IS NOT NULL),
h AS (SELECT regexp_replace(url, '^https://', 'http://') AS url
      FROM t WHERE id % {holdout_mod} = 0),
hk AS (SELECT DISTINCT {_duck_canonical_url()} AS uk
       FROM h WHERE url IS NOT NULL),
tk AS (SELECT id, url, {_duck_canonical_url()} AS uk FROM t)
SELECT id, url FROM tk ANTI JOIN hk ON tk.uk = hk.uk"""


def domain_cap_sql(table: str = "documents",
                   max_per_domain: int = 40) -> str:
    """urls.cap_domains mirrored: the same domain derivation chain
    (host extract -> port strip -> lowercase -> 2-label heuristic) and
    the same deterministic keep-lowest-id-first row_number cap;
    domain-less (malformed) rows kept, like keep_invalid=True."""
    from flink_descriptive_stats_spark.operators import urls as U
    raw_host = f"nullif(regexp_extract(url, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    domain = f"nullif(regexp_extract({host}, '{U.DOMAIN_RE}', 1), '')"
    return f"""
WITH u AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_url_case()} AS url
           FROM {table} WHERE text IS NOT NULL),
d AS (SELECT id, {domain} AS domain FROM u),
r AS (SELECT id, domain,
             row_number() OVER (PARTITION BY domain ORDER BY id) AS rn
      FROM d)
SELECT id, domain FROM r
WHERE domain IS NULL OR rn <= {max_per_domain}"""


# --------------------------------------------------------------------------
# dependency discovery (operators/dependencies.py)
# --------------------------------------------------------------------------

def inclusion_deps_sql(
        specs: list[tuple[str, str, str, str]]) -> str:
    """dependencies.inclusion_dependencies mirrored: per declared
    (child_table, child_col, parent_table, parent_col) spec, DISTINCT
    non-NULL child keys LEFT-joined to DISTINCT non-NULL parent keys,
    orphans counted on the miss; empty child = vacuous containment 1.0
    (the NOT EXISTS convention)."""
    parts = []
    for ct, cc, pt, pc in specs:
        parts.append(f"""
SELECT '{ct}' AS child_table, '{cc}' AS child_col,
       '{pt}' AS parent_table, '{pc}' AS parent_col,
       count(*) AS n_child_distinct,
       count(*) FILTER (WHERE p.__k IS NULL) AS n_orphans
FROM (SELECT DISTINCT {cc} AS __k FROM {ct}
      WHERE {cc} IS NOT NULL) c
LEFT JOIN (SELECT DISTINCT {pc} AS __k FROM {pt}
           WHERE {pc} IS NOT NULL) p USING (__k)""")
    cont = ("CASE WHEN n_child_distinct = 0 THEN 1.0 "
            "ELSE CAST(n_child_distinct - n_orphans AS DOUBLE) "
            "/ CAST(n_child_distinct AS DOUBLE) END")
    return f"""
WITH raw AS ({" UNION ALL ".join(parts)})
SELECT child_table, child_col, parent_table, parent_col,
       n_child_distinct, n_orphans,
       {duck_sig6(cont)} AS containment,
       n_orphans = 0 AS ind_holds
FROM raw"""


def fk_orphans_sql(child: str = "orders", child_col: str = "o_orderkey",
                   parent: str = "lineitem",
                   parent_col: str = "l_orderkey",
                   select_cols: tuple[str, ...] = (
                       "o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice")) -> str:
    """dependencies.fk_orphan_rows mirrored: child rows whose non-NULL
    key has no parent match (NOT EXISTS == Spark's anti-join over the
    distinct parent key)."""
    cols = ", ".join(select_cols)
    return f"""
SELECT {cols} FROM {child} c
WHERE {child_col} IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM {parent} p
                  WHERE p.{parent_col} = c.{child_col})"""


def fk_discover_sql(columns: dict[str, list[str]],
                    min_containment: float = 1.0) -> str:
    """dependencies.fk_discover mirrored declaratively: the output
    contract is "all directed pairs passing the exact-stats pruning
    predicates with exact containment >= min_containment", so the
    oracle computes containment for EVERY pair over a melted
    (table, column, distinct value) frame and filters by the SAME
    predicates — evaluation order differs (Spark prunes before
    joining; that is the scale optimization), results cannot.

    ``columns`` maps table -> its integral columns, matching what the
    Spark side derives from the schema (pinned by a test)."""
    stats, vals = [], []
    for t, cols in columns.items():
        for c in cols:
            stats.append(
                f"SELECT '{t}' AS tbl, '{c}' AS col, count(*) AS n, "
                f"count({c}) AS nn, count(DISTINCT {c}) AS nd, "
                f"CAST(min({c}) AS BIGINT) AS mn, "
                f"CAST(max({c}) AS BIGINT) AS mx FROM {t}")
            vals.append(
                f"SELECT '{t}' AS tbl, '{c}' AS col, "
                f"CAST({c} AS BIGINT) AS v FROM {t} "
                f"WHERE {c} IS NOT NULL GROUP BY 3")
    cont = "CAST(nd - orph AS DOUBLE) / CAST(nd AS DOUBLE)"
    return f"""
WITH stats AS ({" UNION ALL ".join(stats)}),
vals AS ({" UNION ALL ".join(vals)}),
pairs AS (
  SELECT c.tbl AS ct, c.col AS cc, p.tbl AS pt, p.col AS pc
  FROM stats c JOIN stats p
    ON p.n > 0 AND p.nd = p.nn AND p.nn = p.n
   AND NOT (c.tbl = p.tbl AND c.col = p.col)
   AND c.nn > 0 AND c.nd <= p.nd AND c.mn >= p.mn AND c.mx <= p.mx),
cont AS (
  SELECT pr.ct, pr.cc, pr.pt, pr.pc, count(*) AS nd,
         count(*) FILTER (WHERE pv.v IS NULL) AS orph
  FROM pairs pr
  JOIN vals cv ON cv.tbl = pr.ct AND cv.col = pr.cc
  LEFT JOIN vals pv ON pv.tbl = pr.pt AND pv.col = pr.pc
                   AND pv.v = cv.v
  GROUP BY 1, 2, 3, 4)
SELECT ct AS child_table, cc AS child_col,
       pt AS parent_table, pc AS parent_col,
       nd AS n_child_distinct, orph AS n_orphans,
       {duck_sig6(cont)} AS containment,
       regexp_replace(cc, '^[^_]*_', '')
         = regexp_replace(pc, '^[^_]*_', '') AS name_affinity
FROM cont WHERE {cont} >= {min_containment}"""


def fk_discover_composite_sql(min_containment: float = 0.5) -> str:
    """dependencies.fk_discover(max_key_width=2) mirrored on the shared
    composite fixture (__spark_entry__._fk_discover_composite): parent
    = the DISTINCT (orderkey, linenumber) pair table, child = lineitem
    with orders where l_orderkey % 13 = 0 linenumber-swapped to
    8 - l_linenumber (component range preserved, pairs genuinely
    orphaned). The oracle replays BOTH arms of the contract: the
    width-1 predicates over all four columns (which yield zero rows —
    no single column is a key in either table) UNION ALL the width-2
    arm — pair statistics, exact-2-column-key parents, the stats
    prune, and the distinct-pair containment join, all literally in
    SQL over melted pair values."""
    w1 = fk_discover_sql(
        {"linepairs": ["p_orderkey", "p_linenumber"],
         "fact": ["f_orderkey", "f_linenumber"]}, min_containment)
    cont = "CAST(nd - orph AS DOUBLE) / CAST(nd AS DOUBLE)"
    return f"""
WITH linepairs AS (
  SELECT DISTINCT l_orderkey AS p_orderkey,
         l_linenumber AS p_linenumber FROM lineitem),
fact AS (
  SELECT l_orderkey AS f_orderkey,
         CASE WHEN l_orderkey % 13 = 0 THEN 8 - l_linenumber
              ELSE l_linenumber END AS f_linenumber FROM lineitem)
SELECT * FROM ({w1})
UNION ALL
SELECT * FROM (
WITH ps AS (
  SELECT 'linepairs' AS tbl, 'p_linenumber,p_orderkey' AS pr,
         count(*) AS n,
         count(*) FILTER (WHERE p_linenumber IS NOT NULL
                            AND p_orderkey IS NOT NULL) AS nn,
         count(DISTINCT ROW(p_linenumber, p_orderkey)) AS d,
         CAST(min(p_linenumber) AS BIGINT) AS mn1,
         CAST(max(p_linenumber) AS BIGINT) AS mx1,
         CAST(min(p_orderkey) AS BIGINT) AS mn2,
         CAST(max(p_orderkey) AS BIGINT) AS mx2
  FROM linepairs
  UNION ALL
  SELECT 'fact', 'f_linenumber,f_orderkey', count(*),
         count(*) FILTER (WHERE f_linenumber IS NOT NULL
                            AND f_orderkey IS NOT NULL),
         count(DISTINCT ROW(f_linenumber, f_orderkey)),
         CAST(min(f_linenumber) AS BIGINT),
         CAST(max(f_linenumber) AS BIGINT),
         CAST(min(f_orderkey) AS BIGINT),
         CAST(max(f_orderkey) AS BIGINT)
  FROM fact),
prs AS (
  SELECT c.tbl AS ct, c.pr AS cc, p.tbl AS pt, p.pr AS pc
  FROM ps c JOIN ps p
    ON p.n > 0 AND p.nn = p.n AND p.d = p.nn
   AND NOT (c.tbl = p.tbl AND c.pr = p.pr)
   AND c.nn > 0 AND c.d <= p.d
   AND c.mn1 >= p.mn1 AND c.mx1 <= p.mx1
   AND c.mn2 >= p.mn2 AND c.mx2 <= p.mx2),
kv AS (
  SELECT 'linepairs' AS tbl, CAST(p_linenumber AS BIGINT) AS v1,
         CAST(p_orderkey AS BIGINT) AS v2
  FROM linepairs
  WHERE p_linenumber IS NOT NULL AND p_orderkey IS NOT NULL
  GROUP BY 2, 3
  UNION ALL
  SELECT 'fact', CAST(f_linenumber AS BIGINT),
         CAST(f_orderkey AS BIGINT)
  FROM fact
  WHERE f_linenumber IS NOT NULL AND f_orderkey IS NOT NULL
  GROUP BY 2, 3),
cont AS (
  SELECT pr.ct, pr.cc, pr.pt, pr.pc, count(*) AS nd,
         count(*) FILTER (WHERE pv.tbl IS NULL) AS orph
  FROM prs pr
  JOIN kv cv ON cv.tbl = pr.ct
  LEFT JOIN kv pv ON pv.tbl = pr.pt AND pv.v1 = cv.v1
                 AND pv.v2 = cv.v2
  GROUP BY 1, 2, 3, 4)
SELECT ct AS child_table, cc AS child_col,
       pt AS parent_table, pc AS parent_col,
       nd AS n_child_distinct, orph AS n_orphans,
       {duck_sig6(cont)} AS containment,
       TRUE AS name_affinity
FROM cont WHERE {cont} >= {min_containment})"""


# --------------------------------------------------------------------------
# corpus snapshot delta (operators/delta.py)
# --------------------------------------------------------------------------

def _delta_hash(cols: tuple[str, ...], rel: str = "") -> str:
    """delta.content_hash_expr mirrored: md5 over NULL-sentineled,
    unit-separator-joined content columns (sentinels built with chr()
    so no control characters ride inside the SQL text)."""
    from flink_descriptive_stats_spark.operators import delta as DL
    sep = " || ".join(f"chr({ord(ch)})" for ch in DL.HASH_SEP)
    sent = " || ".join(
        f"chr({ord(ch)})" if ord(ch) < 32 else f"'{ch}'"
        for ch in DL.NULL_SENTINEL)
    parts = [f"coalesce(CAST({rel}{c} AS VARCHAR), {sent})" for c in cols]
    return f"md5(concat_ws({sep}, {', '.join(parts)}))"


def _synth_new_snapshot_sql(table: str = "documents") -> str:
    """delta.synth_new_snapshot mirrored (same REMOVED/CHANGED/ADDED
    constants): the deterministic 'next pipeline run' CTE body."""
    from flink_descriptive_stats_spark.operators import delta as DL
    return f"""
  SELECT doc_id,
         CASE WHEN doc_id % {DL.CHANGED_MOD} = 0
              THEN text || ' rev2' ELSE text END AS text,
         lang, source, n_chars
  FROM {table} WHERE doc_id % {DL.REMOVED_MOD} <> 0
  UNION ALL
  SELECT doc_id + {DL.ADDED_ID_OFFSET}, text, lang, source, n_chars
  FROM {table} WHERE doc_id % {DL.ADDED_MOD} = 0"""


def corpus_delta_sql(table: str = "documents",
                     content_cols: tuple[str, ...] = ("text",)) -> str:
    """delta.corpus_delta mirrored: full outer join of the two
    pre-hashed snapshots on id, status by presence + hash equality."""
    ho, hn = _delta_hash(content_cols), _delta_hash(content_cols)
    return f"""
WITH nw AS ({_synth_new_snapshot_sql(table)}),
o AS (SELECT CAST(doc_id AS BIGINT) AS id, {ho} AS ho FROM {table}),
n AS (SELECT CAST(doc_id AS BIGINT) AS id, {hn} AS hn FROM nw)
SELECT coalesce(o.id, n.id) AS id,
       CASE WHEN o.id IS NULL THEN 'added'
            WHEN n.id IS NULL THEN 'removed'
            WHEN ho = hn THEN 'unchanged'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.id = n.id"""


def delta_summary_sql(table: str = "documents",
                      content_cols: tuple[str, ...] = ("text",)) -> str:
    """delta.delta_summary mirrored: always 4 rows (absent statuses at
    n = 0), share = n / union size."""
    from flink_descriptive_stats_spark.operators import delta as DL
    statuses = ", ".join(f"'{s}'" for s in DL.STATUSES)
    share = "CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(total AS DOUBLE)"
    return f"""
WITH delta AS ({corpus_delta_sql(table, content_cols)}),
c AS (SELECT status, count(*) AS n FROM delta GROUP BY status),
s AS (SELECT unnest([{statuses}]) AS status),
t AS (SELECT sum(n) AS total FROM c)
SELECT s.status, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       {duck_sig6(share)} AS share
FROM s LEFT JOIN c USING (status) CROSS JOIN t"""


def delta_by_source_sql(table: str = "documents",
                        content_cols: tuple[str, ...] = ("text",)) -> str:
    """delta.delta_by_source mirrored: source from the new snapshot,
    old for removed docs; observed (source, status) combinations
    only."""
    h = _delta_hash(content_cols)
    return f"""
WITH nw AS ({_synth_new_snapshot_sql(table)}),
o AS (SELECT CAST(doc_id AS BIGINT) AS id, {h} AS ho, source AS so
      FROM {table}),
n AS (SELECT CAST(doc_id AS BIGINT) AS id, {h} AS hn, source AS sn
      FROM nw),
d AS (SELECT coalesce(n.sn, o.so) AS source,
             CASE WHEN o.id IS NULL THEN 'added'
                  WHEN n.id IS NULL THEN 'removed'
                  WHEN ho = hn THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM o FULL OUTER JOIN n ON o.id = n.id)
SELECT source, status, count(*) AS n FROM d GROUP BY source, status"""


# --------------------------------------------------------------------------
# text cleaning / unicode normalization (operators/cleaning.py)
# --------------------------------------------------------------------------

def _duck_str(s: str) -> str:
    """A DuckDB expression equal to the Python string ``s``: printable
    ASCII runs as quoted literals, everything else (control chars,
    non-ASCII) via chr() — so fixture strings with invisible damage
    stay reviewable inside the generated SQL."""
    if s == "":
        return "''"
    parts, run = [], []

    def flush():
        if run:
            lit = "".join(run).replace("'", "''")
            parts.append(f"'{lit}'")
            run.clear()

    for ch in s:
        if 32 <= ord(ch) < 127:
            run.append(ch)
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return " || ".join(parts)


def _synth_dirty_case(id_expr: str = "doc_id",
                      text_expr: str = "text") -> str:
    """cleaning.synth_dirty_expr mirrored: the id%5 damage shells from
    the SAME DIRTY_VARIANTS constants, non-ASCII built via chr()."""
    from flink_descriptive_stats_spark.operators import cleaning as CL
    whens = []
    for i, (pre, post) in enumerate(CL.DIRTY_VARIANTS):
        parts = [p for p in (_duck_str(pre) if pre else "",
                             text_expr,
                             _duck_str(post) if post else "") if p]
        whens.append(f"WHEN {i} THEN {' || '.join(parts)}")
    return (f"CASE CAST({id_expr} AS BIGINT) % {len(CL.DIRTY_VARIANTS)} "
            + " ".join(whens) + " END")


def _dirty_cte(table: str = "documents") -> str:
    return (f"t AS (SELECT CAST(doc_id AS BIGINT) AS id, "
            f"{_synth_dirty_case()} AS dirty FROM {table} "
            f"WHERE text IS NOT NULL)")


def clean_text_sql(table: str = "documents") -> str:
    """cleaning.clean_text mirrored: the same three \\x{HHHH} class
    replaces (RE2 == Java regex on this subset), global flag explicit
    (Spark's regexp_replace is global by default)."""
    from flink_descriptive_stats_spark.operators import cleaning as CL
    x = f"regexp_replace(dirty, '{CL.CONTROL_RE}', '', 'g')"
    x = f"regexp_replace({x}, '{CL.ZERO_WIDTH_RE}', '', 'g')"
    x = f"regexp_replace({x}, '{CL.UNICODE_SPACE_RE}', ' ', 'g')"
    return f"""
WITH {_dirty_cte(table)}
SELECT id, {x} AS text_clean FROM t"""


def cleaning_report_sql(table: str = "documents") -> str:
    """cleaning.cleaning_report mirrored: per-class damage counts via
    regexp_extract_all lengths; both engines' length() counts code
    points, so combining marks and ideographic spaces tally
    identically."""
    from flink_descriptive_stats_spark.operators import cleaning as CL
    n_ctrl = f"len(regexp_extract_all(dirty, '{CL.CONTROL_RE}'))"
    n_zw = f"len(regexp_extract_all(dirty, '{CL.ZERO_WIDTH_RE}'))"
    n_sp = f"len(regexp_extract_all(dirty, '{CL.UNICODE_SPACE_RE}'))"
    clean = f"regexp_replace(dirty, '{CL.CONTROL_RE}', '', 'g')"
    clean = f"regexp_replace({clean}, '{CL.ZERO_WIDTH_RE}', '', 'g')"
    clean = f"regexp_replace({clean}, '{CL.UNICODE_SPACE_RE}', ' ', 'g')"
    return f"""
WITH {_dirty_cte(table)}
SELECT id,
       CAST({n_ctrl} AS BIGINT) AS n_control,
       CAST({n_zw} AS BIGINT) AS n_zero_width,
       CAST({n_sp} AS BIGINT) AS n_unicode_space,
       CAST(len(dirty) AS BIGINT) AS n_chars,
       CAST(len({clean}) AS BIGINT) AS n_chars_clean,
       ({n_ctrl} + {n_zw} + {n_sp}) > 0 AS changed
FROM t"""


def nfc_normalize_sql(table: str = "documents") -> str:
    """cleaning.nfc_normalize mirrored by DuckDB's built-in
    nfc_normalize — both sides implement UAX #15 canonical
    composition, so the normalized STRINGS hash-compare."""
    return f"""
WITH {_dirty_cte(table)}
SELECT id, nfc_normalize(dirty) AS text_nfc FROM t"""


def source_overlap_sql(table: str = "documents",
                       dup_mod: int = 9,
                       dup_source: str = "dupsrc") -> str:
    """dedup.source_overlap mirrored over the shared fixture: the base
    corpus plus a re-sourced copy of every (id %% dup_mod == 0) doc
    under ``dup_source`` — deterministic cross-source duplication the
    raw fixture lacks. DISTINCT (source, md5) frame, hash self-join
    with the a < b order, per-side distinct counts."""
    return f"""
WITH base AS (
  SELECT source, text FROM {table} WHERE text IS NOT NULL
  UNION ALL
  SELECT '{dup_source}' AS source, text FROM {table}
  WHERE text IS NOT NULL AND doc_id % {dup_mod} = 0),
h AS (SELECT DISTINCT source AS s, md5(text) AS hh FROM base),
per AS (SELECT s, count(*) AS n FROM h GROUP BY s),
shared AS (
  SELECT a.s AS source_a, b.s AS source_b, count(*) AS n_shared
  FROM h a JOIN h b ON a.hh = b.hh AND a.s < b.s
  GROUP BY 1, 2)
SELECT source_a, source_b, n_shared,
       {duck_sig6("CAST(n_shared AS DOUBLE) / CAST(na.n AS DOUBLE)")}
         AS containment_a,
       {duck_sig6("CAST(n_shared AS DOUBLE) / CAST(nb.n AS DOUBLE)")}
         AS containment_b
FROM shared
JOIN per na ON na.s = source_a
JOIN per nb ON nb.s = source_b"""


def source_overlap_fuzzy_sql(table: str = "documents",
                             threshold: float = 0.5,
                             max_bucket: int = 1000) -> str:
    """dedup.source_overlap_fuzzy mirrored: the SAME minhash pair CTE
    chain as minhash_pairs_sql, sources joined back for both ids,
    cross-source pairs only, lexically normalized order."""
    return f"""
WITH {_pairs_ctes(table, max_bucket)},
pr AS (SELECT id_a, id_b FROM j WHERE jaccard >= {threshold}),
s AS (SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
      FROM pr JOIN {table} da ON da.doc_id = pr.id_a
              JOIN {table} db ON db.doc_id = pr.id_b
      WHERE da.source <> db.source)
SELECT source_a, source_b, count(*) AS n_pairs
FROM s GROUP BY source_a, source_b"""


def domain_block_sql(table: str = "documents",
                     blocked: tuple[str, ...] = ("example.com",
                                                 "co.uk")) -> str:
    """urls.block_domains mirrored over the URL fixture: same domain
    derivation chain, domain IN blocklist OR host suffix '.entry' OR
    host == entry; domain-less rows kept (keep_invalid=True)."""
    from flink_descriptive_stats_spark.operators import urls as U
    raw_host = f"nullif(regexp_extract(url, '{U.HOST_RE}', 1), '')"
    host = f"lower(regexp_replace({raw_host}, '{U.PORT_RE}', ''))"
    domain = f"nullif(regexp_extract({host}, '{U.DOMAIN_RE}', 1), '')"
    bl = sorted({b.lower() for b in blocked})
    in_list = ", ".join(f"'{b}'" for b in bl)
    hit = f"({domain} IN ({in_list}))"
    for b in bl:
        hit += (f" OR ends_with({host}, '.{b}')"
                f" OR {host} = '{b}'")
    return f"""
WITH u AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  {_synth_url_case()} AS url
           FROM {table} WHERE text IS NOT NULL)
SELECT id, url FROM u
WHERE CASE WHEN {domain} IS NULL AND {host} IS NULL THEN TRUE
           ELSE NOT coalesce({hit}, FALSE) END"""


def lang_segments_sql(table: str = "documents",
                      max_tokens: int = 64,
                      mix_tail_mod: int | None = None) -> str:
    """text.lang_segments mirrored: disjoint token windows from the
    SAME tokenizer, per-chunk stopword votes (the lang_id score and
    tie-order machinery on the chunk's token slice; zh = CJK count on
    the rebuilt chunk text, structurally 0 — see the operator's
    documented limitation), majority by (count DESC, lang ASC)
    row_number. ``mix_tail_mod``: append text.MIXED_LANG_TAIL (two
    rounds of the German stopword list) to every id %% mod == 0 doc —
    the shared code-switch fixture that makes the mixed path
    non-vacuous on the pseudo-English test corpus."""
    mt = max_tokens
    scores = {lang: _stop_filter(words).replace("toks", "ctoks")
              for lang, words in TX.STOPWORDS.items()}
    scores["zh"] = f"len(regexp_extract_all(chunk_text, '{TX.CJK_RE}'))"
    score_cols = ", ".join(f"{scores[lang]} AS s_{lang}"
                           for lang in TX.LANG_ORDER)
    whens = []
    for lang in TX.LANG_ORDER[:-1]:
        cond = " AND ".join(f"s_{lang} >= s_{other}"
                            for other in TX.LANG_ORDER if other != lang)
        whens.append(f"WHEN {cond} THEN '{lang}'")
    pred = f"CASE {' '.join(whens)} ELSE '{TX.LANG_ORDER[-1]}' END"
    if mix_tail_mod is None:
        tcte = _tokens_cte(table)
    else:
        tail = TX.MIXED_LANG_TAIL
        assert "'" not in tail
        texpr = (f"CASE WHEN doc_id % {mix_tail_mod} = 0 "
                 f"THEN text || '{tail}' ELSE text END")
        tcte = (f"t AS (SELECT doc_id AS id, {H.duck_tokens(texpr)} "
                f"AS toks FROM {table} WHERE text IS NOT NULL)")
    return f"""
WITH {tcte},
e AS (SELECT id, toks,
             unnest(generate_series(0,
               CAST(ceil(CAST(len(toks) AS DOUBLE) / {mt}.0) AS INTEGER)
               - 1)) AS ci
      FROM t WHERE len(toks) > 0),
c AS (SELECT id, toks[ci * {mt} + 1 : ci * {mt} + {mt}] AS ctoks,
             array_to_string(toks[ci * {mt} + 1 : ci * {mt} + {mt}],
                             ' ') AS chunk_text
      FROM e),
m AS (SELECT id, {score_cols} FROM c),
v AS (SELECT id, {pred} AS lang FROM m),
g AS (SELECT id, lang, count(*) AS c FROM v GROUP BY id, lang),
r AS (SELECT id, lang, c,
             row_number() OVER (PARTITION BY id
                                ORDER BY c DESC, lang ASC) AS rn,
             sum(c) OVER (PARTITION BY id) AS total,
             count(*) OVER (PARTITION BY id) AS nl
      FROM g)
SELECT CAST(id AS BIGINT) AS id,
       CAST(total AS BIGINT) AS n_chunks,
       CAST(nl AS BIGINT) AS n_langs,
       lang AS majority_lang,
       {duck_sig6("CAST(c AS DOUBLE) / CAST(total AS DOUBLE)")}
         AS majority_share,
       nl > 1 AS mixed
FROM r WHERE rn = 1"""
