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


def robots_pattern_to_regex(pattern: str) -> str | None:
    """RFC 9309 §2.2.3 path pattern → anchored Java/Python regex, or None
    when the pattern is a pure literal prefix (``startswith`` suffices —
    the common case, kept off the regex path entirely).

    ``*`` matches any run of characters; a TRAILING ``$`` anchors the end
    of the path; every other character is literal (``$`` elsewhere too).
    """
    import re as _re

    ends = pattern.endswith("$")
    body = pattern[:-1] if ends else pattern
    if "*" not in body and not ends:
        return None
    rx = "^" + ".*".join(_re.escape(p) for p in body.split("*"))
    return rx + "$" if ends else rx


def robots_rule_cols(robots: DataFrame) -> DataFrame:
    """Ensure a robots rule table carries the full evaluation columns.

    Canonical schema: ``(host, rule, path_pre, path_re, spec_len)`` —
    ``path_pre`` the literal prefix before the first ``*`` (cheap JVM
    pre-filter), ``path_re`` an anchored regex for wildcard/``$`` rules
    (NULL for pure prefixes), ``spec_len`` the ORIGINAL pattern length
    (RFC 9309 precedence is by most-specific = longest PATTERN, wildcards
    counted, exactly as major production matchers implement it). Legacy
    prefix-only tables (``path_pre`` alone) are widened in place so every
    caller keeps working.
    """
    cols = set(robots.columns)
    if "path_re" not in cols:
        robots = robots.withColumn("path_re", F.lit(None).cast("string"))
    if "spec_len" not in cols:
        robots = robots.withColumn(
            "spec_len", F.length(F.coalesce("path_pre", F.lit(""))).cast("int")
        )
    return robots


def robots_filter(refs: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Mark rows disallowed by robots rules (adds boolean ``robots_blocked``).

    ``robots(host, rule, path_pre[, path_re, spec_len])`` with ``rule ∈
    {allow, disallow}``, evaluated with RFC 9309 (Robots Exclusion
    Protocol) precedence: among all rules whose PATTERN matches the URL
    path, the most specific (longest original pattern, ``spec_len``)
    wins; at equal length ``allow`` wins; no matching rule = allowed.
    Empty-pattern rules are dropped at aggregation ("Disallow:" means
    allow-all in REP). Pure-prefix rules (the overwhelming majority) are
    evaluated with prefix arithmetic; wildcard/``$`` rules carry an
    anchored regex (``path_re``) and are matched EXACTLY with
    ``regexp_like`` — ``Disallow: *`` blocks everything, ``Disallow:
    *.php`` blocks only matching paths, and a truncation can no longer
    flip an allow/disallow tie. Everything stays builtin higher-order
    functions over a broadcast-joined per-host rule array: no row
    explosion, no UDF, no shuffle of the refs fact table (the regex path
    only runs for rules that actually contain a wildcard).
    """
    if robots is None:
        return refs.withColumn("robots_blocked", F.lit(False))
    robots = robots_rule_cols(robots)
    rules = (
        robots.where(
            (F.coalesce(F.col("path_pre"), F.lit("")) != "")
            | F.col("path_re").isNotNull()
        )
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct("rule", "path_pre", "path_re", "spec_len")
            ).alias("__rules")
        )
    )
    path = F.regexp_replace(F.col("ref_url"), r"^(?:https?:)?//[^/]*", "")
    matches = F.filter(
        F.col("__rules"),
        lambda r: path.startswith(r["path_pre"])
        & (r["path_re"].isNull() | F.regexp_like(path, r["path_re"])),
    )
    mlen = F.array_max(F.transform(matches, lambda r: r["spec_len"]))
    allow_wins = F.exists(
        matches,
        lambda r: (r["spec_len"] == mlen) & (r["rule"] == "allow"),
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

    Returns ``([(rule, pattern), ...], crawl_delay_ms | None)`` with the
    FULL original patterns preserved (``*`` and trailing ``$`` intact);
    ``robots_table_from_txt`` derives the evaluator's prefix/regex/length
    columns from them.

    - **Group selection**: the group(s) whose ``User-agent`` most
      specifically matches ``agent`` win: exact product-token match beats
      a prefix-of-product-token match (longer prefixes more specific)
      beats ``*`` (RFC 9309 §2.2.1); only the winning groups' rules
      apply. Adjacent user-agent lines share one group. A ``User-agent:``
      line with an EMPTY value is malformed and skipped (it must not
      hijack group selection).
    - **Directives**: ``Allow`` / ``Disallow`` (case-insensitive keys),
      values taken to end-of-line, ``#`` comments stripped, empty
      ``Disallow:`` = allow-all (dropped — the evaluator's contract).
      Wildcard patterns are kept verbatim — ``Disallow: *`` is a
      disallow-all, not a dropped rule.
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
            if val:  # empty UA value is malformed — must not match everything
                cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:  # empty Disallow/Allow = no-op rule (REP allow-all)
                cur_rules.append((key, val))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = int(float(val) * 1000)
            except ValueError:
                pass
    flush()

    def specificity(agents: list[str]) -> int:
        # exact match outranks any prefix; among prefix-of-product-token
        # matches, longer = more specific; "*" matches everything at 1.
        best = -1
        for a in agents:
            if a == agent_l:
                best = max(best, 1_000_000)
            elif a != "*" and agent_l.startswith(a):
                best = max(best, 1 + len(a))
            elif a == "*":
                best = max(best, 1)
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


ROBOTS_ROWS_SCHEMA = (
    "host string, rule string, path_pre string, path_re string, "
    "spec_len int, crawl_delay_ms long"
)


def robots_table_from_txt(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt",
    agent: str = "archivebot",
) -> DataFrame:
    """(host, robots_txt) → (host, rule, path_pre, path_re, spec_len,
    crawl_delay_ms) rows — the distributed parse step between fetching
    per-host robots.txt files and ``robots_filter``/politeness. One Arrow
    batch pass (robots files are tiny and per-host, so this is
    embarrassingly parallel); a host whose file yields only a crawl-delay
    emits one NULL-rule row so the delay survives to the politeness
    table. ``path_pre`` is the literal prefix before the first ``*`` (may
    be empty for leading-wildcard patterns), ``path_re`` the anchored
    regex for wildcard/``$`` patterns (NULL for pure prefixes), and
    ``spec_len`` the original pattern length used for RFC 9309
    most-specific-wins precedence."""
    import pandas as pd

    def _parse(it):
        for pdf in it:
            rows = []
            for h, t in zip(pdf[host_col], pdf[txt_col]):
                rules, delay = parse_robots_txt(t or "", agent)
                if not rules and delay is None:
                    continue
                if not rules:
                    rows.append((h, None, None, None, None, delay))
                for r, pat in rules:
                    body = pat[:-1] if pat.endswith("$") else pat
                    rows.append(
                        (h, r, body.split("*", 1)[0],
                         robots_pattern_to_regex(pat), len(pat), delay)
                    )
            yield pd.DataFrame(
                rows,
                columns=["host", "rule", "path_pre", "path_re",
                         "spec_len", "crawl_delay_ms"],
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
