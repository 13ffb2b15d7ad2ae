"""PySpark-native data-profiling / analytics engine.

A brand-new engine with the query and data-processing capabilities of
okkam-it/flink-descriptive-stats (reference at /root/reference, studied via
SURVEY.md), re-expressed idiomatically on Spark DataFrames:

- the whole per-column profile (counts, nulls, min/max/mean, central moments,
  derived standard errors, Jarque-Bera, lengths, latent-type inference) is ONE
  shuffle-light ``df.agg(...)`` — Spark's partial+final HashAggregate is the
  same algebraic-merge model as the reference's ``StatsPojo.reduce``
  (reference: src/main/java/org/apache/flink/stats/StatsPojo.java:101-155).
- top-K frequent values / character patterns are ONE multiplexed grouped job
  over a melted (column, token) frame, with Spark's WindowGroupLimit
  rank-limit pushdown bounding the per-column funnel (reference runs 2
  serial parallelism-1 sorts per string column, ProfileJob.java:195-208 —
  an anti-pattern at scale).
- the same aggregate bundle runs under Structured Streaming windows.

Extensions beyond the reference surface: distinct counts, quartiles,
histograms, outliers, correlation (the reference's own declared roadmap,
ProfileJob.java:67-71) plus large-scale pipeline operators: dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine), similarity search,
text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

from flink_descriptive_stats_spark.session import get_spark  # noqa: F401
