"""Deterministic sampling for training-data curation.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
runs and cluster sizes, (b) pure filters — no shuffle, no RNG state, no
driver coordination — so they push down to the scan, and (c) stratified,
because corpus curation quotas are per-language/per-source (the standard
web-corpus recipe: cap the dominant language, oversample the rare ones).

The selector is an md5-prefix threshold: keep a row iff the first 8 hex
chars of ``md5(key | salt)`` are lexicographically below the rate's hex
threshold. Lowercase fixed-width hex compares lexicographically ==
numerically, md5 is uniform on the prefix, and the SAME expression runs
in any ANSI SQL engine (the DuckDB oracle mirrors it verbatim) — unlike
``df.sample()``, whose partition-seeded RNG changes membership with the
partitioning. Changing ``salt`` draws an independent sample; the filter
composes with column pruning and rides the scan (zero extra stages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16**8


def _threshold_hex(rate: float) -> str:
    """Rate → 8-char lower-hex threshold; 'g' sorts above every hex
    string (rate ≥ 1 keeps all), '' below (rate ≤ 0 keeps none)."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return format(int(rate * _SPACE), "08x")


def _selector(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 8)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    return df.where(_selector(F.col(key_col), salt) < F.lit(_threshold_hex(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (language/source quotas).

    Still a pure filter: the per-stratum threshold is a CASE expression,
    so the plan is one scan with the predicate pushed down — no shuffle,
    no per-stratum pass, identical membership at any partitioning.
    """
    thr: Column = F.lit(_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.where(_selector(F.col(key_col), salt) < thr)


def group_split(
    df: DataFrame,
    group_col: str,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val assignment: the GROUP, not the row, is the
    unit — every member of a (near-)dup group lands on the same side, so
    held-out rows can never be near-duplicates of training rows (the
    in-corpus contamination mode that benchmark decontamination against
    an EXTERNAL eval set cannot catch). Compose with ``text_dup_groups``
    / ``connected_components`` output: ``group_col`` is the component id.

    Pure projection over the group id (xxhash64 → bucket 0-99, ``val``
    below ``val_pct``): no shuffle beyond what produced the groups, no
    RNG state, membership identical at any partitioning and cluster
    size — at 100 TB the split rides the dedup pipeline's existing
    group assignment and stays codegen'd JVM-side."""
    bucket = F.pmod(
        F.xxhash64(F.concat(F.lit(salt + "|"), F.col(group_col).cast("string"))),
        F.lit(100),
    ).cast("int")
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < int(val_pct), F.lit("val")).otherwise(F.lit("train")),
    )
