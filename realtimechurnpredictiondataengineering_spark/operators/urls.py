"""URL / domain operators — the crawl-side stages every web-scale corpus
pipeline runs between the WARC front-door and the text gates: URL
parsing, registered-domain extraction (public-suffix aware), per-domain
document caps, host blocklist filtering, and URL canonicalization.

CCNet, C4 and RefinedWeb all gate on URLs before touching text:  C4
drops blocklisted domains, RefinedWeb caps documents per registered
domain and deduplicates by canonical URL, CCNet groups shards by domain.
The reference's pipeline has no crawl leg (its Bronze feed is Kafka
JSON, Bronze1.py:87-94), so this family — like the rest of §2.10 — is
the training-data-pipeline surface the engine adds on top of reference
parity.

Spark-first shapes, chosen per operator:

- **Parsing / normalization are scan-local column expressions** —
  `regexp_extract` / `split` / `array_sort` / higher-order `filter`,
  zero Python, zero shuffle; they ride whole-stage codegen and any
  filter on their output pushes into the scan.
- **Registered-domain extraction is a broadcast equi-join** against the
  (tiny) multi-label public-suffix table — never a regex-per-suffix
  scan: the suffix list ships to every executor once and the probe is
  one hash lookup per row.
- **Blocklist filtering is a suffix-ladder equality join**: each host
  explodes into its parent-domain chain (depth 3) and equi-joins the
  broadcast blocklist.  The naive spelling — `rlike` per blocklist
  entry — is O(hosts x entries) regex work and un-indexable; the
  ladder join is O(hosts x 3) hash probes and stays a broadcast at any
  corpus size because blocklists (even UT1's ~4M rows) fit in one
  executor's memory.
- **Per-domain caps are one shuffle on the registered domain** with a
  rank-limit window Spark 3.5 plans as WindowGroupLimit (partial
  top-K before the shuffle), so a skewed mega-domain ships only its
  top-K candidates per map partition, not every row.

Every operator is oracle-checkable: the junk a normalizer removes
(case, default ports, utm params, param order, fragments) is
deterministic arithmetic both engines compute identically.

Cross-engine contract notes: `regexp_extract` returns '' on no-match in
BOTH Spark and DuckDB (wrapped in nullif where a NULL is wanted);
`array_sort` / `list_sort` both sort ASCII strings bytewise; `%` on
non-negative BIGINT agrees; `md5` hex agrees.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Public-suffix (PSL-lite) + blocklist tables
# ---------------------------------------------------------------------------

#: Multi-label public suffixes (PSL-lite).  The real Public Suffix List
#: is ~10k rules; at cluster scale it loads from a file into the same
#: broadcast join — the OPERATOR SHAPE is what matters, and a
#: representative two-label subset keeps the repo hermetic.
PUBLIC_SUFFIXES_2LABEL: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ac.jp", "ne.jp",
    "com.br", "co.in", "co.nz", "co.kr",
)

#: (host_suffix, category) — UT1-style category blocklist.  A suffix
#: entry blocks the domain and every subdomain; an exact-host entry
#: (one with a subdomain label) blocks only that host.  Chosen to hit
#: the derived-URL host space (see `derived_urls`) plus one
#: deliberately unmatched entry so empty categories are exercised.
BLOCKLIST: tuple[tuple[str, str], ...] = (
    ("site7.com", "ads"),
    ("site13.com.au", "gambling"),
    ("www.site21.com.au", "tracking"),
    ("site4.co.uk", "adult"),
    ("site999.example", "malware"),
)

#: Maximum parent-chain depth for the blocklist ladder.  3 rungs cover
#: host, registrable domain and one subdomain level for every host the
#: derived-URL space produces; real crawls raise it to the PSL's max
#: label depth (5) — each rung is one cheap regexp_replace.
LADDER_DEPTH = 3


# ---------------------------------------------------------------------------
# Deterministic derived URLs (the oracle-checkable URL corpus)
# ---------------------------------------------------------------------------
#
# The driver tables carry no URL column, so the family derives one per
# document with BOTH engines computing the identical string (the P11
# md5 precedent): the host / path / scheme are pure doc_id arithmetic
# (coarse mod → a collision-RICH canonical space, so normalization
# genuinely merges variants), while the junk a normalizer must remove —
# upper-case hosts, default ports, utm_* params, param order, fragments
# — is derived from md5 hex bytes, independent of the canonical key.

_SUBDOMAINS = ("", "www.", "blog.", "docs.", "m.")
_SUFFIXES = (".com", ".org", ".net", ".io", ".co.uk", ".com.au", ".ac.jp", ".de")
_SCHEMES = ("https", "http")
#: query-string variants: utm params in both positions, unsorted params,
#: and no query at all
_QUERIES = ("?utm_source=feed&ref=1", "?ref=1&utm_campaign=spring", "?b=2&a=1", "")


def _pick(idx: Column, options: Sequence[str]) -> Column:
    c = F.when(idx == 0, F.lit(options[0]))
    for i, opt in enumerate(options[1:], 1):
        c = c.when(idx == i, F.lit(opt))
    return c


def _sql_pick(idx_sql: str, options: Sequence[str]) -> str:
    whens = " ".join(
        f"WHEN {idx_sql} = {i} THEN '{opt}'" for i, opt in enumerate(options)
    )
    return f"(CASE {whens} END)"


def _hb(i: int) -> Column:
    """i-th md5 hex byte of the doc_id — the junk entropy source."""
    return F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), i, 1))


def _sql_hb(i: int) -> str:
    return f"ascii(substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1))"


def derived_urls(docs: DataFrame) -> DataFrame:
    """documents + a deterministic `url` column (see module comment).

    Scan-local; both engines build the identical string, so every
    downstream URL operator stays value-checkable.
    """
    k = F.col("doc_id") % 100
    host = F.concat(
        _pick(k % 5, _SUBDOMAINS),
        F.lit("site"), (k % 25).cast("string"),
        _pick(k % 8, _SUFFIXES),
    )
    scheme = _pick(k % 2, _SCHEMES)
    # junk: case, port, params, fragment — md5-derived, canonical-key
    # independent
    host_cased = F.when(_hb(1) % 3 == 0, F.upper(host)).otherwise(host)
    port = (
        F.when(
            _hb(2) % 3 == 0,
            F.when(scheme == "https", F.lit(":443")).otherwise(F.lit(":80")),
        )
        .when(_hb(2) % 7 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    query = _pick(_hb(3) % 4, _QUERIES)
    fragment = F.when(_hb(5) % 2 == 0, F.lit("#sec")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), host_cased, port,
        F.lit("/p/"), (k % 20).cast("string"),
        query, fragment,
    )
    return docs.withColumn("url", url)


def sql_derived_url() -> str:
    """DuckDB twin of `derived_urls`'s url expression (same arithmetic,
    same literals — single-sourced from the module constants)."""
    k = "(doc_id % 100)"
    host = (
        f"{_sql_pick(f'{k} % 5', _SUBDOMAINS)} || 'site' || "
        f"CAST({k} % 25 AS VARCHAR) || {_sql_pick(f'{k} % 8', _SUFFIXES)}"
    )
    scheme = _sql_pick(f"{k} % 2", _SCHEMES)
    host_cased = f"(CASE WHEN {_sql_hb(1)} % 3 = 0 THEN upper({host}) ELSE {host} END)"
    port = (
        f"(CASE WHEN {_sql_hb(2)} % 3 = 0 THEN "
        f"(CASE WHEN {scheme} = 'https' THEN ':443' ELSE ':80' END) "
        f"WHEN {_sql_hb(2)} % 7 = 1 THEN ':8080' ELSE '' END)"
    )
    query = _sql_pick(f"{_sql_hb(3)} % 4", _QUERIES)
    fragment = f"(CASE WHEN {_sql_hb(5)} % 2 = 0 THEN '#sec' ELSE '' END)"
    return (
        f"{scheme} || '://' || {host_cased} || {port} || "
        f"'/p/' || CAST({k} % 20 AS VARCHAR) || {query} || {fragment}"
    )


# ---------------------------------------------------------------------------
# URL parsing (scan-local)
# ---------------------------------------------------------------------------

#: (component, regex, needs_nullif) — one anchored RE2/Java-portable
#: pattern per RFC 3986 component (no lookarounds, no backrefs; both
#: engines return '' on no-match).  Userinfo is out of scope: crawl
#: URLs with credentials are dropped upstream by every real pipeline.
_URL_PATTERNS: tuple[tuple[str, str], ...] = (
    ("scheme", r"^([A-Za-z][A-Za-z0-9+.-]*)://"),
    ("host", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"),
    ("port", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)"),
    ("path", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"),
    ("query", r"\?([^#]*)"),
    ("fragment", r"#(.*)$"),
)


def url_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds scheme/host/port/path/query/fragment columns parsed from
    `url_col`.  Pure regexp_extract projections — scan-local, codegen,
    no shuffle; scheme and host are LOWERCASED (RFC 3986 §6.2.2.1 —
    they are case-insensitive; path/query are not).  Absent components
    are NULL; port is an INT."""
    out = df
    for name, pat in _URL_PATTERNS:
        c = F.nullif(F.regexp_extract(F.col(url_col), pat, 1), F.lit(""))
        if name in ("scheme", "host"):
            c = F.lower(c)
        elif name == "port":
            c = c.cast("int")
        out = out.withColumn(name, c)
    return out


def sql_url_components(url_sql: str = "url") -> dict[str, str]:
    """DuckDB twins of `url_components`'s six expressions, keyed by
    component name (same patterns, same lowercase/int contract)."""
    out: dict[str, str] = {}
    for name, pat in _URL_PATTERNS:
        p = pat.replace("'", "''")
        e = f"nullif(regexp_extract({url_sql}, '{p}', 1), '')"
        if name in ("scheme", "host"):
            e = f"lower({e})"
        elif name == "port":
            e = f"CAST({e} AS INT)"
        out[name] = e
    return out


# ---------------------------------------------------------------------------
# Registered domain (PSL-lite broadcast join)
# ---------------------------------------------------------------------------

_LAST1 = r"([^.]+)$"
_LAST2 = r"([^.]+[.][^.]+)$"
_LAST3 = r"([^.]+[.][^.]+[.][^.]+)$"


def suffix_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(s,) for s in PUBLIC_SUFFIXES_2LABEL], "suffix string"
    )


def registered_domain(df: DataFrame, spark: SparkSession, host_col: str = "host") -> DataFrame:
    """Adds `registered_domain` + `public_suffix` via one broadcast
    equi-join on the host's last-two-labels against the multi-label
    suffix table: a hit means the public suffix is two labels deep, so
    the registrable domain is the last THREE labels; a miss means the
    standard one-label suffix.  NULL host → NULL both.  O(rows) hash
    probes; the suffix table broadcasts once."""
    h = F.col(host_col)
    last1 = F.nullif(F.regexp_extract(h, _LAST1, 1), F.lit(""))
    last2 = F.nullif(F.regexp_extract(h, _LAST2, 1), F.lit(""))
    last3 = F.nullif(F.regexp_extract(h, _LAST3, 1), F.lit(""))
    probed = df.withColumn("__l1", last1).withColumn("__l2", last2).withColumn("__l3", last3)
    joined = probed.join(
        F.broadcast(suffix_table(spark)), probed["__l2"] == F.col("suffix"), "left"
    )
    two_label = F.col("suffix").isNotNull() & F.col("__l3").isNotNull()
    return joined.withColumn(
        "registered_domain", F.when(two_label, F.col("__l3")).otherwise(F.col("__l2"))
    ).withColumn(
        "public_suffix", F.when(two_label, F.col("__l2")).otherwise(F.col("__l1"))
    ).drop("suffix", "__l1", "__l2", "__l3")


def sql_suffix_values() -> str:
    return "(VALUES " + ", ".join(f"('{s}')" for s in PUBLIC_SUFFIXES_2LABEL) + ")"


def sql_registered_domain(host_sql: str = "host") -> tuple[str, str, str]:
    """(join_probe_sql, registered_sql, public_suffix_sql) — the DuckDB
    twin assumes a LEFT JOIN `sfx(suffix)` on `__l2 = suffix` exists
    and refers to __l1/__l2/__l3 columns produced by join_probe_sql."""
    probe = (
        f"nullif(regexp_extract({host_sql}, '{_LAST1}', 1), '') AS __l1, "
        f"nullif(regexp_extract({host_sql}, '{_LAST2}', 1), '') AS __l2, "
        f"nullif(regexp_extract({host_sql}, '{_LAST3}', 1), '') AS __l3"
    )
    two = "(suffix IS NOT NULL AND __l3 IS NOT NULL)"
    return (
        probe,
        f"(CASE WHEN {two} THEN __l3 ELSE __l2 END)",
        f"(CASE WHEN {two} THEN __l2 ELSE __l1 END)",
    )


# ---------------------------------------------------------------------------
# Blocklist (suffix-ladder equality join)
# ---------------------------------------------------------------------------


def host_ladder(host: Column) -> Column:
    """array(host, parent, grandparent) — the suffix chain the
    blocklist join probes.  Each rung strips one leading label; rungs
    that would strip past the registrable domain repeat the shorter
    form and are deduplicated by the caller's `distinct`."""
    rungs = [F.lower(host)]
    for _ in range(LADDER_DEPTH - 1):
        rungs.append(F.regexp_replace(rungs[-1], r"^[^.]+[.]", ""))
    return F.array_distinct(F.array(*rungs))


def sql_host_ladder(host_sql: str) -> str:
    rungs = [f"lower({host_sql})"]
    for _ in range(LADDER_DEPTH - 1):
        rungs.append(f"regexp_replace({rungs[-1]}, '^[^.]+\\.', '')")
    return "list_distinct([" + ", ".join(rungs) + "])"


def blocklist_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(BLOCKLIST), "entry string, category string")


def blocked_docs(df: DataFrame, spark: SparkSession, host_col: str = "host") -> DataFrame:
    """(doc_id, host, category) for every doc whose host ladder hits a
    blocklist entry — explode + broadcast equi-join, one row per
    distinct (doc, category) even when multiple rungs match."""
    ladder = df.select(
        "doc_id", F.col(host_col).alias("host"),
        F.explode(host_ladder(F.col(host_col))).alias("rung"),
    )
    return (
        ladder.join(F.broadcast(blocklist_table(spark)), F.col("rung") == F.col("entry"))
        .select("doc_id", "host", "category")
        .distinct()
    )


def sql_blocklist_values() -> str:
    return (
        "(VALUES "
        + ", ".join(f"('{e}', '{c}')" for e, c in BLOCKLIST)
        + ")"
    )


# ---------------------------------------------------------------------------
# URL normalization (scan-local)
# ---------------------------------------------------------------------------


def normalized_url(df: DataFrame) -> Column:
    """Canonical URL from the parsed components (expects the
    `url_components` columns): lowercase scheme+host (already done by
    the parser), strip fragments, strip DEFAULT ports (80/http,
    443/https — non-default ports are meaningful and kept), drop
    `utm_*` tracking params, and sort the surviving params bytewise so
    param order never splits a canonical group.  Pure expressions —
    `split`/`filter`/`array_sort`/`array_join` — zero Python."""
    scheme, host, port = F.col("scheme"), F.col("host"), F.col("port")
    default = ((scheme == "http") & (port == 80)) | ((scheme == "https") & (port == 443))
    port_part = F.when(
        port.isNull() | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port.cast("string")))
    path_part = F.coalesce(F.col("path"), F.lit("/"))
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.coalesce(F.col("query"), F.lit("")), "&"),
                lambda x: (x != "") & ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    query_part = F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)


def sql_normalized_url(c: dict[str, str] | None = None) -> str:
    """DuckDB twin of `normalized_url`; `c` maps component name → SQL
    (defaults to bare column references from a prior CTE)."""
    c = c or {k: k for k, _ in _URL_PATTERNS}
    scheme, host, port = c["scheme"], c["host"], c["port"]
    default = (
        f"(({scheme} = 'http' AND {port} = 80) OR ({scheme} = 'https' AND {port} = 443))"
    )
    port_part = (
        f"(CASE WHEN {port} IS NULL OR {default} THEN '' "
        f"ELSE ':' || CAST({port} AS VARCHAR) END)"
    )
    path_part = f"COALESCE({c['path']}, '/')"
    # COALESCE: DuckDB's array_to_string returns NULL on an EMPTY list
    # where Spark's array_join returns '' — probed, not assumed
    kept = (
        f"COALESCE(array_to_string(list_sort(list_filter("
        f"string_split(COALESCE({c['query']}, ''), '&'), "
        f"x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '')"
    )
    query_part = f"(CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END)"
    return f"{scheme} || '://' || {host} || {port_part} || {path_part} || {query_part}"


# ---------------------------------------------------------------------------
# Link extraction (the crawl-frontier / link-graph stage)
# ---------------------------------------------------------------------------
#
# A crawler's frontier and every link-graph signal (in-degree ranking,
# spam neighborhoods, anchor-text retrieval) start from <a href> pairs.
# One RE2/Java-portable pattern captures (href, anchor); extraction is
# regexp_extract_all — scan-local, zero Python — and the anchor text is
# cleaned with the same html_to_text contract the body extraction uses.
# Only double-quoted hrefs are captured (the overwhelmingly dominant
# form; single-quoted/bare attributes are a parser's job, documented
# out of scope like userinfo URLs).

LINK_PATTERN = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def link_hrefs(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(LINK_PATTERN), F.lit(1))


def link_anchors(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(LINK_PATTERN), F.lit(2))


def sql_link_parts(col_sql: str) -> tuple[str, str]:
    p = LINK_PATTERN.replace("'", "''")
    return (
        f"regexp_extract_all({col_sql}, '{p}', 1)",
        f"regexp_extract_all({col_sql}, '{p}', 2)",
    )


def canonical_url(k: Column) -> Column:
    """The junk-free canonical URL for derived-key ``k`` — what
    `normalized_url` maps every `derived_urls` variant of ``k`` to
    when no non-default port / surviving params apply.  Used to mint
    deterministic absolute link TARGETS."""
    host = F.concat(
        _pick(k % 5, _SUBDOMAINS),
        F.lit("site"), (k % 25).cast("string"),
        _pick(k % 8, _SUFFIXES),
    )
    return F.concat(
        _pick(k % 2, _SCHEMES), F.lit("://"), host,
        F.lit("/p/"), (k % 20).cast("string"),
    )


def sql_canonical_url(k_sql: str) -> str:
    host = (
        f"{_sql_pick(f'{k_sql} % 5', _SUBDOMAINS)} || 'site' || "
        f"CAST({k_sql} % 25 AS VARCHAR) || {_sql_pick(f'{k_sql} % 8', _SUFFIXES)}"
    )
    return (
        f"{_sql_pick(f'{k_sql} % 2', _SCHEMES)} || '://' || {host} || "
        f"'/p/' || CAST({k_sql} % 20 AS VARCHAR)"
    )
