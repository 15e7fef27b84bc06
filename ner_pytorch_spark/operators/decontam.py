"""Corpus-hygiene operators a production training-data pipeline needs
beyond dedup: benchmark DECONTAMINATION (n-gram overlap between a
training corpus and an evaluation/benchmark set) and domain-scoped
BOILERPLATE removal (lines repeated across many pages of one domain —
the CCNet/trafilatura cleanup shape).

Both are pure relational plans (no UDFs):

* decontamination — explode DISTINCT word n-grams per doc on both
  sides, hash each n-gram to int64 (``xxhash64`` — the join key is 8
  bytes, never the string), equi-join train×benchmark on the hash,
  aggregate per training doc. At 100 TB the join is linear in
  Σ df_train(g)·df_bench(g); ubiquitous n-grams (boilerplate runs,
  stopword chains) are the quadratic hot keys, so ``max_bench_df``
  drops n-grams appearing in more than that many benchmark docs — a
  stop-n-gram cap with the same shape as dedup's ``max_block``
  (ubiquitous n-grams carry no contamination signal).
* boilerplate — explode lines keyed by (domain, line), count DISTINCT
  docs per line within the domain, lines above a doc-frequency
  threshold are boilerplate; removal is a broadcast-free left-anti
  semi-join back on (domain, line). Two shuffles total (count +
  join), both on (domain, line-hash) — domain-skew shares the salting
  story of the KG pipeline's domain repartition.

The reference repo has no decontamination/boilerplate stage (it
consumes CoNLL files); these are engine-side additions for the 100 TB
web corpus the north rule targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plan_cache import PlanCache, plan_key

# benchmark-side per-doc gram table: referenced by BOTH the stop-n-gram
# cap branch (df ≤ max_bench_df) and the overlap equi-join — Spark
# evaluates each branch independently, so without a persist the
# explode+hash+distinct subplan over the benchmark ran TWICE per call
# (measured 2×0.55 s + the cap agg at 30k-doc scale). Keyed by the
# benchmark's analyzed plan like every other plan cache in the package;
# benchmark sets are small and stable across a decontamination pass, so
# this is the natural unit to persist on a cluster too.
_BENCH_GRAM_CACHE = PlanCache(capacity=2)

# exploded-line table: strip_boilerplate references it from TWO plan
# branches (the boilerplate-frequency table and the keep anti-join), and
# boilerplate_lines is additionally called standalone — same
# evaluate-once-per-branch story as the gram table above.
_LINES_CACHE = PlanCache(capacity=2)


def clear_caches() -> None:
    """Unpersist the decontam/boilerplate caches (test/ops hook, same
    contract as :func:`ner_pytorch_spark.operators.dedup.clear_caches`)."""
    _BENCH_GRAM_CACHE.clear()
    _LINES_CACHE.clear()


_WS = r"\s+"


def _line_explode(docs: DataFrame, text_col: str, id_col: str,
                  domain_col: str) -> DataFrame:
    return _LINES_CACHE.get_or_build(
        (plan_key(docs), text_col, id_col, domain_col),
        lambda: docs.select(
            id_col, domain_col,
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("line_no", "line"))
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
    )


def doc_ngram_hashes(docs: DataFrame, n: int = 8, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """→ (id_col, gram_hash) — DISTINCT word-n-gram hashes per doc.

    Tokens = lowercased ``\\s+`` split (the dedup family's contract);
    the n-gram string is the space-join of n consecutive tokens, hashed
    to int64 JVM-side. Distinct-per-doc BEFORE the join keeps the
    overlap metric "number of shared distinct n-grams", invariant to
    in-doc repetition.

    Construction is the word_shingles zip_with fold over a PROJECTED
    token column: the earlier transform(sequence, slice(toks…)) form
    embedded the split() EXPRESSION inside the per-position lambda, so
    the regex tokenization re-ran once per n-gram position — O(len²)
    regex work per doc (measured 18.4 s vs 2.4 s for the 3-gram table
    over 30k ~300-token docs; outputs row-identical).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), _WS)
    with_toks = docs.select(F.col(id_col), toks.alias("_toks"))
    m = F.size("_toks") - n + 1
    acc = F.slice("_toks", 1, m)
    for i in range(1, n):
        acc = F.zip_with(acc, F.slice("_toks", 1 + i, m),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    # short texts (size < n) must yield an EMPTY gram set (slice with a
    # non-positive length would error / the old sequence(0, stop<0) form
    # descended)
    grams = F.when(F.size("_toks") >= n, acc).otherwise(
        F.array().cast("array<string>"))
    return (
        with_toks.select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(id_col, F.xxhash64("gram").alias("gram_hash"))
        .distinct()
    )


def benchmark_overlap(train: DataFrame, benchmark: DataFrame, n: int = 8,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bench_df: int | None = None) -> DataFrame:
    """Contamination report: per training doc, how much of the
    benchmark it leaks.

    → (doc_id, n_shared_ngrams, n_bench_docs): the count of distinct
    n-grams shared with ANY benchmark doc, and the count of distinct
    benchmark docs sharing at least one n-gram. Only training docs with
    ≥1 shared n-gram appear.

    ``max_bench_df`` drops n-grams present in more than that many
    benchmark docs before the join (stop-n-gram skew cap; ``None``
    disables).
    """
    tg = doc_ngram_hashes(train, n, text_col, id_col)
    bg = _BENCH_GRAM_CACHE.get_or_build(
        (plan_key(benchmark), n, text_col, id_col),
        lambda: doc_ngram_hashes(benchmark, n, text_col, id_col).select(
            F.col(id_col).alias("bench_id"), "gram_hash"))
    if max_bench_df is not None:
        keep = (bg.groupBy("gram_hash")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_bench_df)
                .select("gram_hash"))
        bg = bg.join(keep, on="gram_hash")
    return (
        tg.join(bg, on="gram_hash")
        .groupBy(id_col)
        .agg(F.countDistinct("gram_hash").alias("n_shared_ngrams"),
             F.countDistinct("bench_id").alias("n_bench_docs"))
    )


def decontaminate(train: DataFrame, benchmark: DataFrame, n: int = 8,
                  min_shared: int = 1, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_bench_df: int | None = None) -> DataFrame:
    """Training docs with < ``min_shared`` benchmark n-grams — the
    cleaned corpus (left-anti join against the contamination report)."""
    dirty = (benchmark_overlap(train, benchmark, n, text_col, id_col,
                               max_bench_df)
             .filter(F.col("n_shared_ngrams") >= min_shared)
             .select(id_col))
    return train.join(dirty, on=id_col, how="left_anti")


def boilerplate_lines(docs: DataFrame, min_doc_frac: float = 0.2,
                      min_docs: int = 2, text_col: str = "text",
                      id_col: str = "doc_id",
                      domain_col: str = "source") -> DataFrame:
    """Domain-scoped boilerplate table → (domain, line, n_docs,
    doc_frac): non-empty trimmed lines appearing in ≥ ``min_docs``
    distinct docs AND ≥ ``min_doc_frac`` of the domain's docs (nav
    bars, footers, cookie banners — the lines a crawl repeats
    per-site). Counting is distinct-docs-per-(domain, line); the
    per-domain doc totals ride a broadcast of one row per domain.
    """
    lines = _line_explode(docs, text_col, id_col, domain_col)
    per_line = (lines.groupBy(domain_col, "line")
                .agg(F.countDistinct(id_col).alias("n_docs")))
    totals = F.broadcast(
        docs.groupBy(domain_col)
        .agg(F.countDistinct(id_col).alias("domain_docs")))
    return (
        per_line.join(totals, on=domain_col)
        .withColumn("doc_frac",
                    F.round(F.col("n_docs") / F.col("domain_docs"), 6))
        .filter((F.col("n_docs") >= min_docs)
                & (F.col("doc_frac") >= min_doc_frac))
        .select(domain_col, "line", "n_docs", "doc_frac")
    )


def strip_boilerplate(docs: DataFrame, min_doc_frac: float = 0.2,
                      min_docs: int = 2, text_col: str = "text",
                      id_col: str = "doc_id",
                      domain_col: str = "source") -> DataFrame:
    """Docs with boilerplate lines removed: every surviving line
    re-joined with ``\\n`` in original order. Plan: line explode →
    left-anti join on (domain, line) against the boilerplate table →
    re-assemble via collect_list over a window-free groupBy with
    position sort (array_sort on (line_no, line) structs — no window,
    no skewed single partition). Docs whose every line was boilerplate
    keep an empty text.
    """
    bp = boilerplate_lines(docs, min_doc_frac, min_docs, text_col,
                           id_col, domain_col).select(domain_col, "line")
    lines = _line_explode(docs, text_col, id_col, domain_col)
    kept = lines.join(bp, on=[domain_col, "line"], how="left_anti")
    assembled = (
        kept.groupBy(id_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("line_no"), F.col("line")))),
                lambda s: s["line"]),
            "\n").alias("clean_text"))
    )
    return (
        docs.join(assembled, on=id_col, how="left")
        .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
    )
