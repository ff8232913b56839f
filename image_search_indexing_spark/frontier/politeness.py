"""Per-host politeness scheduler: robots rules, budgets, priority queue.

The reference paces crawling operationally (1-5 WARCs per map task,
``README.md:46``) and has no robots/priority machinery — those are
north-rule additions. Semantics here:

- **robots**: per-host disallow path-prefix rules. Rules are aggregated to
  one array per host and **broadcast-joined** (small dimension), evaluated
  with ``F.exists`` — no row explosion, no UDF, no extra shuffle.
- **budgets**: per-host ``max_fetch_per_round`` (broadcast dimension);
  hosts without a configured budget get ``default_budget``.
- **priority queue**: deterministic total order per host —
  ``(priority, page_ts, length(url), url)`` — the reference's champion
  tie-break style (``FullImageMetadata.java:171-186``,
  ``ImageData.java:255-282``: time first, then URL-length, then URL) so
  crawl order is bit-stable at any partition count.
- **skew**: a hot host (10M candidates on one window partition) is the
  classic straggler. Selection runs in two phases:
  (1) per ``(host, salt)`` — ``salt = pmod(xxhash64(url_hash), S)`` —
  take the per-salt top-``budget`` (a superset of the true top-``budget``);
  (2) re-rank the ≤ ``S × budget`` survivors per host. Phase-2 groups are
  bounded, so no partition exceeds ``S × budget`` rows per host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def robots_filter(refs: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Mark rows disallowed by robots rules (adds boolean ``robots_blocked``).

    ``robots(host, rule, path_pre)`` with ``rule ∈ {allow, disallow}``,
    evaluated with RFC 9309 (Robots Exclusion Protocol) precedence: among
    all rules whose path prefix matches the URL path, the LONGEST prefix
    wins; at equal length ``allow`` wins; no matching rule = allowed.
    Empty-prefix rules are dropped at aggregation ("Disallow:" means
    allow-all in REP). Wildcard rules (``*``/``$``) are resolved to prefix
    rules at robots.txt PARSE time upstream — evaluation here is pure
    prefix arithmetic, so the whole check is builtin higher-order
    functions over a broadcast-joined per-host rule array: no row
    explosion, no UDF, no shuffle of the refs fact table.
    """
    if robots is None:
        return refs.withColumn("robots_blocked", F.lit(False))
    rules = (
        robots.where(F.coalesce(F.col("path_pre"), F.lit("")) != "")
        .groupBy("host")
        .agg(F.collect_list(F.struct("rule", "path_pre")).alias("__rules"))
    )
    path = F.regexp_replace(F.col("ref_url"), r"^(?:https?:)?//[^/]*", "")
    matches = F.filter(F.col("__rules"), lambda r: path.startswith(r["path_pre"]))
    mlen = F.array_max(F.transform(matches, lambda r: F.length(r["path_pre"])))
    allow_wins = F.exists(
        matches,
        lambda r: (F.length(r["path_pre"]) == mlen) & (r["rule"] == "allow"),
    )
    blocked = (F.size(matches) > 0) & ~allow_wins
    return (
        refs.join(F.broadcast(rules), "host", "left")
        .withColumn("robots_blocked", F.coalesce(blocked, F.lit(False)))
        .drop("__rules")
    )


def crawl_order() -> list[Column]:
    """The deterministic total order of the frontier queue (per host)."""
    return [
        F.col("priority").asc_nulls_last(),
        F.col("page_ts").asc_nulls_last(),
        F.length("ref_url").asc(),
        F.col("ref_url").asc(),
    ]


def schedule_round(
    candidates: DataFrame,
    politeness: DataFrame | None,
    default_budget: int = 5,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Select each host's top-``budget`` candidates, skew-safely.

    Input: one row per *new, allowed* URL with columns at least
    ``(ref_url, url_hash, host, priority, page_ts)``. Output adds
    ``queue_pos`` (1-based per-host fetch order) and ``fetch_delay_ms``
    (queue_pos × crawl_delay_ms), restricted to scheduled rows.
    """
    if politeness is not None:
        budgets = politeness.select(
            "host",
            F.col("max_fetch_per_round").alias("__budget"),
            F.col("crawl_delay_ms").alias("__delay"),
        )
        cand = candidates.join(F.broadcast(budgets), "host", "left")
    else:
        cand = candidates.withColumn("__budget", F.lit(None).cast("int")).withColumn(
            "__delay", F.lit(None).cast("long")
        )
    cand = cand.withColumn("__budget", F.coalesce("__budget", F.lit(default_budget))).withColumn(
        "__delay", F.coalesce("__delay", F.lit(1000).cast("long"))
    )

    order = crawl_order()
    # Phase 1: per-(host, salt) partial top-budget — bounded partitions even
    # for a pathological host. The per-salt top-k is a superset of the true
    # per-host top-k, so phase 2 sees every true winner.
    salted = cand.withColumn("__salt", F.pmod(F.xxhash64("url_hash"), F.lit(n_salts)))
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= F.col("__budget"))
        .drop("__rn1", "__salt")
    )
    # Phase 2: exact per-host rank over ≤ n_salts × budget survivors.
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        survivors.withColumn("queue_pos", F.row_number().over(w2))
        .where(F.col("queue_pos") <= F.col("__budget"))
        .withColumn("fetch_delay_ms", (F.col("queue_pos").cast("long") - 1) * F.col("__delay"))
        .drop("__budget", "__delay")
    )
