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


def parse_robots_txt(text: str, agent: str = "archivebot") -> tuple[list[tuple[str, str]], int | None]:
    """Parse a robots.txt FILE into ``robots_filter`` rows — RFC 9309
    group selection + directive extraction (pure Python; runs where the
    fetcher runs, one call per host, so rows — not files — are what the
    cluster broadcasts).

    Returns ``([(rule, path_pre), ...], crawl_delay_ms | None)``.

    - **Group selection**: the group(s) whose ``User-agent`` most
      specifically matches ``agent`` win (exact/substring match beats
      ``*``; RFC 9309 §2.2.1); only the winning groups' rules apply.
      Adjacent user-agent lines share one group.
    - **Directives**: ``Allow`` / ``Disallow`` (case-insensitive keys),
      values taken to end-of-line, ``#`` comments stripped, empty
      ``Disallow:`` = allow-all (dropped — the evaluator's contract).
    - **Wildcards**: patterns are truncated at the first ``*`` and a
      trailing ``$`` is stripped — the standard prefix approximation
      (fast-path used by production crawlers); the approximation widens
      the rule's match set in its OWN direction, never flips precedence
      class, and keeps evaluation pure prefix arithmetic JVM-side.
    - **Crawl-delay**: parsed from the winning group (seconds → ms) for
      the politeness table; invalid numbers ignored.
    """
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    cur_delay: int | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            pre = val.split("*", 1)[0]
            if pre.endswith("$"):
                pre = pre[:-1]
            if pre:
                cur_rules.append((key, pre))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = int(float(val) * 1000)
            except ValueError:
                pass
    flush()

    def specificity(agents: list[str]) -> int:
        best = -1
        for a in agents:
            if a == agent_l:
                best = max(best, 2)
            elif a != "*" and (a in agent_l or agent_l in a):
                best = max(best, 1)
            elif a == "*":
                best = max(best, 0)
        return best

    best = max((specificity(a) for a, _, _ in groups), default=-1)
    if best < 0:
        return [], None
    rules: list[tuple[str, str]] = []
    delay: int | None = None
    for agents, rs, d in groups:
        if specificity(agents) == best:
            rules.extend(rs)
            if d is not None:
                delay = d if delay is None else min(delay, d)
    return rules, delay


ROBOTS_ROWS_SCHEMA = "host string, rule string, path_pre string, crawl_delay_ms long"


def robots_table_from_txt(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt",
    agent: str = "archivebot",
) -> DataFrame:
    """(host, robots_txt) → (host, rule, path_pre, crawl_delay_ms) rows —
    the distributed parse step between fetching per-host robots.txt files
    and ``robots_filter``/politeness. One Arrow batch pass (robots files
    are tiny and per-host, so this is embarrassingly parallel); a host
    whose file yields only a crawl-delay emits one NULL-rule row so the
    delay survives to the politeness table."""
    import pandas as pd

    def _parse(it):
        for pdf in it:
            rows = []
            for h, t in zip(pdf[host_col], pdf[txt_col]):
                rules, delay = parse_robots_txt(t or "", agent)
                if not rules and delay is None:
                    continue
                if not rules:
                    rows.append((h, None, None, delay))
                for r, p in rules:
                    rows.append((h, r, p, delay))
            yield pd.DataFrame(
                rows, columns=["host", "rule", "path_pre", "crawl_delay_ms"]
            )

    return df.mapInPandas(_parse, ROBOTS_ROWS_SCHEMA)


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
