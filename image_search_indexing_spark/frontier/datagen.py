"""Deterministic synthetic interleaved text+media corpus generator.

Produces the ``BASELINE.json`` input_hint shape::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus the side tables from ``FIXTURES.md``: ``docmeta`` (per-doc base URL +
fetch timestamp — the WARC-record envelope analog), ``seeds``,
``politeness`` and ``robots``.

Scale design: generation runs distributed via ``mapInPandas`` over
``spark.range(n_docs)``; all randomness comes from a counter-based Philox
stream keyed by ``seed`` and advanced to ``doc_id * DRAWS_PER_DOC``, so the
output is **bit-identical at any partition count** (local[8] == local[32] ==
a 1000-executor cluster) and there is no driver-side bottleneck — this is
how the 10^10-URL bench input would be produced on a real cluster.

Knobs (FIXTURES.md §1): spans/doc, media-kind share, relative/absolute/
data-URL mix, duplicate-URL rate (drives seen-set dedup), hot-host
concentration (Zipf-ish skew for the straggler tests), malformed-URL rate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DRAWS_PER_DOC = 8  # uniform draws consumed per doc (fixed → seekable stream)
MAX_SPANS_DRAWS = 48  # per-span draw budget (kind, host, path, dup, text, style)

SPANS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
DOCMETA_SCHEMA = "doc_id string, base_url string, fetch_ts string"

_VOCAB = np.array(
    [f"palavra{i}" for i in range(64)]
    + "de que e o da do em um uma para com os the and of to in is".split(),
    dtype=object,
)

_KINDS = np.array(["img", "a", "css"], dtype=object)


@dataclass(frozen=True)
class GenConfig:
    n_docs: int = 1000
    seed: int = 42
    mean_spans: int = 12
    media_share: float = 0.45  # fraction of spans that are media refs
    n_hosts: int = 200
    zipf_alpha: float = 1.3  # host skew: lower rank → many more refs
    dup_rate: float = 0.25  # media refs drawn from a popular-URL pool
    n_popular: int = 500
    rel_rate: float = 0.25  # relative media_ref (resolved against base_url)
    data_url_rate: float = 0.02
    malformed_rate: float = 0.01
    text_words_max: int = 14


def _host_of(hid: np.ndarray) -> np.ndarray:
    """host index → hostname. Deterministic; a handful of TLDs."""
    tld = np.where(hid % 3 == 0, ".pt", np.where(hid % 3 == 1, ".com", ".org"))
    return np.char.add(np.char.add("site", hid.astype("U12")), tld).astype(object)


def _gen_batch(ids: np.ndarray, cfg: GenConfig) -> pd.DataFrame:
    """Generate one contiguous batch of documents (vectorized numpy)."""
    n = len(ids)
    # Counter-based stream: doc d owns draws [d*K, (d+1)*K) of the Philox
    # sequence keyed by cfg.seed — partition-count invariant by construction.
    per_doc = DRAWS_PER_DOC + MAX_SPANS_DRAWS * 6
    assert per_doc % 4 == 0  # Philox.advance counts 4-uint64 counter blocks
    bitgen = np.random.Philox(key=cfg.seed)
    bitgen.advance(int(ids.min()) * per_doc // 4)
    rng = np.random.Generator(bitgen)
    u = rng.random((n, per_doc))

    n_spans = (1 + np.floor(u[:, 0] * (2 * cfg.mean_spans - 1))).astype(np.int64)
    n_spans = np.minimum(n_spans, MAX_SPANS_DRAWS)
    base_host = np.floor((u[:, 1] ** cfg.zipf_alpha) * cfg.n_hosts).astype(np.int64)
    fetch_day = (u[:, 2] * 365).astype(np.int64)

    doc_ids = np.char.add("doc-", np.char.zfill(ids.astype("U12"), 9)).astype(object)
    base_urls = np.char.add(
        np.char.add("http://www.", _host_of(base_host).astype("U32")),
        np.char.add("/page/", np.char.add(ids.astype("U12"), ".html")),
    ).astype(object)
    # archive-format fetch timestamps across 2016 (yyyyMMddHHmmss)
    ts = (
        pd.to_datetime("2016-01-01")
        + pd.to_timedelta(fetch_day, unit="D")
        + pd.to_timedelta((u[:, 3] * 86400).astype(np.int64), unit="s")
    )
    fetch_ts = ts.strftime("%Y%m%d%H%M%S").astype(object)

    # --- per-span draws, ragged via repeat/cumsum -------------------------
    total = int(n_spans.sum())
    doc_idx = np.repeat(np.arange(n), n_spans)  # row of each span
    span_pos = np.arange(total) - np.repeat(np.cumsum(n_spans) - n_spans, n_spans)
    # take 6 independent draws per span from the doc's reserved block
    base_col = DRAWS_PER_DOC + span_pos * 6
    draws = np.stack([u[doc_idx, base_col + j] for j in range(6)], axis=1)

    is_media = draws[:, 0] < cfg.media_share
    kind = np.where(is_media, _KINDS[(draws[:, 1] * 3).astype(np.int64)], "text").astype(object)

    # media refs -----------------------------------------------------------
    span_host = np.floor((draws[:, 2] ** cfg.zipf_alpha) * cfg.n_hosts).astype(np.int64)
    is_dup = draws[:, 3] < cfg.dup_rate
    pop_id = (draws[:, 4] * cfg.n_popular).astype(np.int64)
    uniq_id = np.repeat(ids, n_spans) * 64 + span_pos
    img_id = np.where(is_dup, pop_id, uniq_id)
    img_host = np.where(is_dup, pop_id % cfg.n_hosts, span_host)
    path = np.char.add(
        np.char.add("/img/", img_id.astype("U16")),
        np.where(kind == "css", ".gif", np.where(draws[:, 5] < 0.5, ".jpg", ".png")).astype("U5"),
    ).astype(object)
    absolute = np.char.add(
        np.char.add("http://www.", _host_of(img_host).astype("U32")).astype("U48"), path.astype("U32")
    ).astype(object)
    relative = path
    r = draws[:, 5]
    ref = np.where(r < cfg.rel_rate, relative, absolute).astype(object)
    # data: URLs and malformed monsters
    is_data = r >= (1 - cfg.data_url_rate)
    ref[is_data] = "data:image/png;base64,iVBORw0KGgo" + pd.Series(img_id[is_data]).astype(str)
    is_bad = (r >= (1 - cfg.data_url_rate - cfg.malformed_rate)) & ~is_data
    if is_bad.any():
        ref[is_bad] = "http://www.evil.pt/" + "x" * 10001  # >10000-char URL → dropped+counted

    # text spans -----------------------------------------------------------
    nwords = 1 + (draws[:, 2] * cfg.text_words_max).astype(np.int64)
    w1 = _VOCAB[(draws[:, 3] * len(_VOCAB)).astype(np.int64)]
    w2 = _VOCAB[(draws[:, 4] * len(_VOCAB)).astype(np.int64)]
    w3 = _VOCAB[(draws[:, 5] * len(_VOCAB)).astype(np.int64)]
    text = np.char.add(
        np.char.add(w1.astype("U16"), np.char.add(" ", w2.astype("U16"))),
        np.char.add(" ", np.char.add(w3.astype("U16"), np.char.add(" fim", nwords.astype("U4")))),
    ).astype(object)
    # ~15% of text spans are empty (whitespace) — exercises the caption
    # nearest-non-empty scan (reference sibling fallback analog)
    text[(draws[:, 1] < 0.15) & ~is_media] = " "

    span_kind = kind
    span_text = np.where(is_media, None, text)
    span_ref = np.where(is_media, ref, None)

    spans_flat = [
        {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
        for k, t, m, o in zip(span_kind, span_text, span_ref, span_pos)
    ]
    bounds = np.cumsum(n_spans)[:-1]
    spans_per_doc = [list(a) for a in np.split(np.array(spans_flat, dtype=object), bounds)]

    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "spans": spans_per_doc,
            "base_url": base_urls,
            "fetch_ts": fetch_ts,
        }
    )


def generate(spark: SparkSession, cfg: GenConfig, partitions: int | None = None):
    """documents + docmeta DataFrames (lazy, distributed, deterministic)."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    rng_cfg = cfg

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), rng_cfg)

    full_schema = SPANS_SCHEMA + ", base_url string, fetch_ts string"
    base = spark.range(0, cfg.n_docs, numPartitions=parts)
    both = base.mapInPandas(gen, schema=full_schema)
    docs = both.select("doc_id", "spans")
    meta = both.select("doc_id", "base_url", "fetch_ts")
    return docs, meta


def write_corpus(spark: SparkSession, cfg: GenConfig, out_dir: str) -> None:
    """Materialize documents/docmeta/seeds/politeness/robots under out_dir."""
    docs, meta = generate(spark, cfg)
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    meta.write.mode("overwrite").parquet(f"{out_dir}/docmeta.parquet")
    seeds(spark, cfg).write.mode("overwrite").parquet(f"{out_dir}/seeds.parquet")
    politeness(spark, cfg).write.mode("overwrite").parquet(f"{out_dir}/politeness.parquet")
    robots(spark, cfg).write.mode("overwrite").parquet(f"{out_dir}/robots.parquet")


def seeds(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Seed list: one seed per host (FIXTURES.md §2), fixed injection time."""
    import pyspark.sql.functions as F

    hid = F.col("id")
    tld = F.when(hid % 3 == 0, ".pt").when(hid % 3 == 1, ".com").otherwise(".org")
    host = F.concat(F.lit("site"), hid.cast("string"), tld)
    return (
        spark.range(0, cfg.n_hosts)
        .select(
            F.concat(F.lit("http://www."), host, F.lit("/")).alias("url"),
            host.alias("host"),
            (hid % 10).cast("int").alias("priority"),
            F.to_timestamp(F.lit("2016-01-01 00:00:00")).alias("ts"),
        )
    )


def politeness(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Per-host fetch budgets (FIXTURES.md §3). Deterministic in host id."""
    import pyspark.sql.functions as F

    hid = F.col("id")
    tld = F.when(hid % 3 == 0, ".pt").when(hid % 3 == 1, ".com").otherwise(".org")
    host = F.concat(F.lit("site"), hid.cast("string"), tld)
    return spark.range(0, cfg.n_hosts).select(
        host.alias("host"),
        (F.lit(3) + (hid % 8)).cast("int").alias("max_fetch_per_round"),
        (F.lit(500) + (hid % 5) * 250).cast("long").alias("crawl_delay_ms"),
    )


def robots(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """robots.txt rules exercising RFC 9309 precedence: every 7th host
    disallows /img/1*, every 13th all /img/ — but every 13th also ALLOWS
    the longer /img/12 prefix (longest-match: those URLs stay fetchable),
    and hosts divisible by both get an allow tied in length with a
    disallow (allow wins the tie)."""
    import pyspark.sql.functions as F

    hid = F.col("id")
    tld = F.when(hid % 3 == 0, ".pt").when(hid % 3 == 1, ".com").otherwise(".org")
    host = F.concat(F.lit("site"), hid.cast("string"), tld)
    base = spark.range(0, cfg.n_hosts)
    r1 = base.where(hid % 7 == 0).select(
        host.alias("host"), F.lit("disallow").alias("rule"), F.lit("/img/1").alias("path_pre")
    )
    r2 = base.where(hid % 13 == 0).select(
        host.alias("host"), F.lit("disallow").alias("rule"), F.lit("/img/").alias("path_pre")
    )
    # longest-match override: /img/12* allowed on the /img/-disallowed hosts
    r3 = base.where(hid % 13 == 0).select(
        host.alias("host"), F.lit("allow").alias("rule"), F.lit("/img/12").alias("path_pre")
    )
    # equal-length tie on hosts hit by both r1 and r2: allow /img/1 wins
    r4 = base.where((hid % 7 == 0) & (hid % 13 == 0)).select(
        host.alias("host"), F.lit("allow").alias("rule"), F.lit("/img/1").alias("path_pre")
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)
