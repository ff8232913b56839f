"""XXH64 expressed in pure DuckDB SQL — the oracle twin of Spark's
``F.xxhash64`` on strings.

Why this exists: three driver queries (``simhash_buckets``,
``simhash_pairs_xx``, ``rolling_fp``) use ``xxhash64`` — the production
token/content hash a 100 TB run wants (JVM-native, no md5 bignum cost).
DuckDB has no xxhash64 built-in, so through round 3 those queries were
rows-only-checked.  But the algorithm (Yann Collet, public domain,
github.com/Cyan4973/xxHash) is just mod-2^64 integer arithmetic — and
DuckDB's 128-bit HUGEINT can express a wrap-around 64x64 multiply
exactly: ``lo32(a)*b + (hi32(a)*lo32(b) mod 2^32) << 32  (mod 2^64)``
(every intermediate < 2^97, well inside HUGEINT).  This module GENERATES
that SQL: a chain of lateral column aliases per sequential hash step,
``list_reduce`` (with the prepend-the-init trick — DuckDB 1.0 has no
init argument) for the stripe and tail loops, and the
``list_transform([e], x -> body)[1]`` let-binding idiom inside lambdas
so generated expression size stays linear in the number of steps.

The generated SQL is unit-tested byte-for-byte against
``functions.hashing.xxhash64`` (itself pinned to Spark's output) over
empty/ASCII/multi-byte-UTF-8 inputs spanning every length class of the
algorithm (0, <4, <8, <32, 32+, 300+) in ``tests/test_kernels.py``.

Spark hashes the UTF-8 bytes of the string with seed 42 and returns a
*signed* long; ``xxh64_sql_signed`` reproduces exactly that.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 1 << 64


def _mul(a: str, b: str) -> str:
    """(a * b) mod 2^64 for HUGEINT expressions in [0, 2^64).

    ``a`` is referenced twice and ``b`` twice — pass column names or
    lambda variables (or short literals), never large expressions."""
    return (
        f"((({a}) % 4294967296) * ({b})"
        f" + ((({a}) // 4294967296) * (({b}) % 4294967296) % 4294967296)"
        f" * 4294967296) % {_M}"
    )


def _rotl(x: str, r: int) -> str:
    """rotl64 — ``x`` referenced twice; same caveat as ``_mul``."""
    return f"((({x}) * {1 << r}) % {_M} + ({x}) // {1 << (64 - r)})"


def _let(binds: list[tuple[str, str]], body: str) -> str:
    """Nested list_transform let-bindings: evaluate each expression once,
    name it, use it any number of times downstream — keeps generated SQL
    linear where naive inlining would be exponential."""
    out = body
    for var, expr in reversed(binds):
        out = f"list_transform([{expr}], {var} -> {out})[1]"
    return out


def _le_lane(bys: str, off: str, nbytes: int) -> str:
    """Little-endian integer from ``nbytes`` list elements starting at
    1-based offset ``off``+1 (``off`` may reference a lambda variable)."""
    terms = [f"({bys})[({off}) + {j + 1}]::HUGEINT * {256 ** j}" for j in range(nbytes)]
    return "(" + " + ".join(terms) + ")"


def _round(acc: str, lane: str) -> str:
    """acc' = rotl31(acc + lane*P2) * P1   (both args must be cheap)."""
    return _let(
        [("zq", f"(({acc}) + {_mul(lane, str(_P2))}) % {_M}"), ("zr", _rotl("zq", 31))],
        _mul("zr", str(_P1)),
    )


def utf8_bytes_sql(s: str) -> str:
    """list<BIGINT> of the UTF-8 bytes of string expression ``s``.

    DuckDB's ``ord`` yields the code point; the CASE ladder re-encodes it
    (1-4 byte sequences) so the hash covers non-ASCII exactly like
    Spark's UTF8String bytes. NULL maps to ``[]`` deliberately so the
    downstream integer layers never see NULL — callers that need Spark's
    NULL semantics (``xxhash64(NULL) = seed``) must branch on the
    original column, as ``xxh64_cte`` does with its null flag."""
    cp = "ord(ch)"
    enc = (
        f"CASE WHEN {cp} < 128 THEN [{cp}] "
        f"WHEN {cp} < 2048 THEN [192 + {cp} // 64, 128 + {cp} % 64] "
        f"WHEN {cp} < 65536 THEN [224 + {cp} // 4096, 128 + ({cp} // 64) % 64, 128 + {cp} % 64] "
        f"ELSE [240 + {cp} // 262144, 128 + ({cp} // 4096) % 64,"
        f" 128 + ({cp} // 64) % 64, 128 + {cp} % 64] END"
    )
    return (
        f"CASE WHEN ({s}) = '' OR ({s}) IS NULL THEN []::BIGINT[] "
        f"ELSE flatten(list_transform(string_split({s}, ''), ch -> {enc})) END"
    )


def xxh64_layers(bys: str, prefix: str, seed: int = 42) -> list[list[str]]:
    """Sequential hash steps as LAYERS of SELECT items.  Each inner list
    is one subquery level whose expressions reference only columns of
    the level below — the caller nests them as
    ``SELECT *, <layer> FROM (...)``.  Real nesting matters: DuckDB's
    lateral column aliases are textually inlined, so a flat alias chain
    where steps reference predecessors multiple times (the avalanche
    xors, the merge rounds) explodes exponentially; subquery columns are
    projected once per row.  ``bys`` names a list<BIGINT> column; the
    final unsigned value lands in column ``{prefix}h``."""
    p = prefix
    init = [
        (seed + _P1 + _P2) % _M,  # v1
        (seed + _P2) % _M,        # v2
        seed % _M,                # v3
        (seed - _P1) % _M,        # v4
    ]
    layers: list[list[str]] = [[f"len({bys}) AS {p}n"], [f"({p}n // 32) * 32 AS {p}i0"]]
    # --- stripe loop: 4 independent folds over interleaved 8-byte lanes
    stripe: list[str] = []
    for k in range(4):
        lanes = (
            f"list_transform(range(0, {p}n // 32),"
            f" sx -> {_le_lane(bys, f'32 * sx + {8 * k}', 8)})"
        )
        stripe.append(
            f"list_reduce(list_prepend({init[k]}::HUGEINT, {lanes}),"
            f" (va, lx) -> {_round('va', 'lx')}) AS {p}v{k + 1}"
        )
    layers.append(stripe)
    conv = " + ".join(_rotl(f"{p}v{k + 1}", r) for k, r in enumerate((1, 7, 12, 18)))
    layers.append([f"({conv}) % {_M} AS {p}mg0"])
    for k in range(4):
        layers.append([
            f"({_mul(f'xor({p}mg{k}, ' + _round('0::HUGEINT', f'{p}v{k + 1}') + ')', str(_P1))}"
            f" + {_P4}) % {_M} AS {p}mg{k + 1}"
        ])
    layers.append([
        f"(CASE WHEN {p}n >= 32 THEN {p}mg4 ELSE {(seed + _P5) % _M}::HUGEINT END"
        f" + {p}n) % {_M} AS {p}t0"
    ])
    # --- 8-byte tail lanes
    lanes8 = (
        f"list_transform(range(0, ({p}n - {p}i0) // 8),"
        f" jx -> {_le_lane(bys, f'{p}i0 + 8 * jx', 8)})"
    )
    step8 = _let(
        [("zu", "xor(ha, " + _round("0::HUGEINT", "lx") + ")"), ("zv", _rotl("zu", 27))],
        f"({_mul('zv', str(_P1))} + {_P4}) % {_M}",
    )
    layers.append([
        f"list_reduce(list_prepend({p}t0, {lanes8}), (ha, lx) -> {step8}) AS {p}t1",
        f"{p}i0 + (({p}n - {p}i0) // 8) * 8 AS {p}i1",
    ])
    # --- one optional 4-byte lane
    layers.append([
        f"CASE WHEN {p}n - {p}i1 >= 4 THEN"
        f" xor({p}t1, {_mul(_le_lane(bys, f'{p}i1', 4), str(_P1))})"
        f" ELSE NULL END AS {p}x4"
    ])
    layers.append([
        f"CASE WHEN {p}x4 IS NOT NULL THEN"
        f" ({_mul(_rotl(f'{p}x4', 23), str(_P2))} + {_P3}) % {_M}"
        f" ELSE {p}t1 END AS {p}t2",
        f"CASE WHEN {p}n - {p}i1 >= 4 THEN {p}i1 + 4 ELSE {p}i1 END AS {p}i2",
    ])
    # --- byte tail
    tail = f"list_transform(({bys})[{p}i2 + 1:{p}n], bx -> bx::HUGEINT)"
    stepb = _let(
        [("zu", f"xor(ha, {_mul('bx', str(_P5))})")],
        _mul(_rotl("zu", 11), str(_P1)),
    )
    layers.append([
        f"list_reduce(list_prepend({p}t2, {tail}), (ha, bx) -> {stepb}) AS {p}t3"
    ])
    # --- avalanche
    layers.append([f"{_mul(f'xor({p}t3, {p}t3 // {1 << 33})', str(_P2))} AS {p}a1"])
    layers.append([f"{_mul(f'xor({p}a1, {p}a1 // {1 << 29})', str(_P3))} AS {p}a2"])
    layers.append([f"xor({p}a2, {p}a2 // {1 << 32}) AS {p}h"])
    return layers


def signed(h: str) -> str:
    """Unsigned [0, 2^64) HUGEINT expression -> Spark's signed BIGINT."""
    return f"(CASE WHEN ({h}) >= {1 << 63} THEN ({h}) - {_M} ELSE ({h}) END)::BIGINT"


def xxh64_cte(
    src: str, string_col: str, out_col: str, keep: str,
    seed: int = 42, signed_out: bool = True,
) -> str:
    """A subquery pyramid hashing ``string_col`` of relation ``src`` into
    ``out_col`` alongside ``keep`` (comma-joined passthrough columns).
    ``signed_out=True`` yields Spark's signed BIGINT; ``False`` keeps the
    raw unsigned HUGEINT in [0, 2^64) — bit tests via ``(h // 2^b) % 2``
    then need no assumptions about shift semantics on negative BIGINTs.
    Usable as a CTE definition body."""
    bys = utf8_bytes_sql(string_col)
    # NULL input: Spark's xxhash64 returns the seed unchanged for a NULL
    # column (it hashes zero bytes, not '' ) — carry a null flag beside
    # the byte list (which maps NULL -> [] purely so the arithmetic
    # layers stay null-free) and emit the seed for flagged rows.
    inner = (
        f"(SELECT {keep}, {bys} AS xxb,"
        f" (({string_col}) IS NULL) AS xxnull FROM {src})"
    )
    for layer in xxh64_layers("xxb", "xx", seed):
        inner = f"(SELECT *, {', '.join(layer)} FROM {inner})"
    out = signed("xxh") if signed_out else "xxh"
    return (
        f"SELECT {keep}, CASE WHEN xxnull THEN {seed} ELSE {out} END"
        f" AS {out_col} FROM {inner}"
    )
