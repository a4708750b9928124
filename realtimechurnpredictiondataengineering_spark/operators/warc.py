"""WARC shard segmentation over concatenated gzip members (§2.10's
crawl-ingest leg; the input format the ll14 streaming chain models).

A crawl shard (WARC/WET) is many CONCATENATED gzip members, one WARC
record per member — random-access tooling depends on those member
boundaries.  Two kernels, one contract:

- ``warc_stored_records`` — the ORACLE-CHECKABLE expression path: a
  bounded member walk (gzip header → single final STORED deflate block
  → CRC32/ISIZE trailer → next member) in pure scan-local hex
  arithmetic.  Stored blocks (BTYPE=00) are the one deflate shape whose
  content is scan-readable without a codec, so this leg is REAL decode
  with zero Python; a compressed or multi-block member ends the walk
  (members before it still emit).
- ``warc_records`` / ``warc_text_records`` — the GENERAL path:
  Arrow-batched ``mapInPandas`` kernels that inflate every member with
  stdlib ``zlib`` (REAL decompression, no external codec needed), so
  compressed and multi-block members parse too.  Memory is BOUNDED:
  at most ``_REC_KEEP`` inflated bytes are retained per member and a
  member inflating past ``_REC_INFLATE_CAP`` stops the walk (deflate
  bombs reach ~1032:1 — an unbounded inflate would let a few-MB
  hostile member materialize GBs on an executor).  Same output schema
  as the expression path; the stored subset is pytest-cross-checked.

Both parse only the WARC HEADER BLOCK (ASCII by spec) — version,
WARC-Type, WARC-Target-URI, Content-Length — locating the
header/content boundary (CRLF CRLF) in the HEX view with byte
alignment enforced by a ``(?:[0-9A-F]{2})*?`` lazy walk, inside a
bounded ``_HDR_WINDOW_BYTES`` prefix.

The documents adapter (``warc_text_documents`` expression path /
``warc_text_records`` kernel path) is HTTP-aware: a genuine WARC
``response`` record's content block is a full HTTP response (status
line + headers + CRLF CRLF + body), so the adapter splits the HTTP
header block from the body at the second CRLF CRLF boundary, surfaces
``http_status`` / ``content_type``, keeps only 200s, and ingests the
BODY as document text.  WET shards distribute ``conversion`` records
(bare extracted text, no HTTP block) — the ``record_types`` parameter
admits them, and any content that does not start with ``HTTP/`` is
ingested whole (which also keeps pre-split bare-body archives
working).  Body text is gated on WELL-FORMED UTF-8 (the RFC 3629
byte-class grammar over the hex view): valid multi-byte UTF-8 decodes
identically in Spark and DuckDB, so real web text (CJK, emoji,
combining marks) flows through oracle-checked; only INVALID sequences
take the NULL contract (never replacement-character divergence).

Reference parity: the reference's ingest reads pre-split JSON events
(Bronze1.py:87-94); WARC segmentation is part of the beyond-reference
LLM-pipeline surface (SURVEY §2.10), feeding the ll14-style gates.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Member-walk budget per payload for the EXPRESSION kernel: each fold
#: step consumes one whole member.  Shards with more members report the
#: first ``_WARC_MEMBER_BUDGET`` (the zlib kernels have no such cap —
#: at real shard sizes they are the scale path anyway).
_WARC_MEMBER_BUDGET = 6

#: FNAME zero-terminator scan budget (bytes), the m09 convention.
_NAME_BUDGET = 64

#: The WARC header block must terminate (CRLF CRLF) within this many
#: bytes of the record start; real WARC headers are a few hundred
#: bytes.  Past the window → NULL header fields.
_HDR_WINDOW_BYTES = 1024

#: ``doc_id`` packs (media_id, member_no) as
#: ``media_id * _DOC_ID_BASE + member_no`` in BOTH adapter paths.  The
#: expression walk's budget keeps member_no tiny; the kernel path has
#: no member cap, so the base must exceed any real shard's member
#: count (Common Crawl shards run ~10^5 records; 10^6 leaves media_id
#: headroom to ~9.2e12 in an int64).
_DOC_ID_BASE = 1_000_000

#: hex-alignment-safe "prefix up to the first CRLF CRLF" pattern: the
#: lazy two-hex-digit group can only stop on byte boundaries, so a
#: 0D0A0D0A straddling two bytes can never match.
_HDR_BOUNDARY_RE = "^((?:[0-9A-F]{2})*?)0D0A0D0A"

#: all-ASCII gate over a hex view (first nibble 0-7 ⟺ byte < 0x80);
#: stays the gate for protocol text (WARC header block, HTTP header
#: block, FNAME) which is ASCII by spec.
_ASCII_HEX_RE = "^([0-7][0-9A-F])*$"

#: WELL-FORMED-UTF-8 gate over a hex view — the RFC 3629 byte-class
#: grammar, one alternative per sequence length with the overlong /
#: surrogate / >U+10FFFF exclusions encoded in the lead-byte ranges
#: (C2-DF, E0+A0-BF, E1-EC, ED+80-9F, EE-EF, F0+90-BF, F1-F3,
#: F4+80-8F).  Alternatives are disjoint on their first byte, so the
#: match is deterministic (no backtracking blowup).  Equivalent to
#: Python's strict ``bytes.decode("utf-8")`` acceptance set — the
#: kernel path relies on that equivalence.  ``_UTF8_HEX_BODY`` is the
#: unanchored body for DuckDB's ``regexp_full_match`` twin.
_UTF8_CONT = "[89AB][0-9A-F]"
_UTF8_HEX_BODY = (
    "(?:[0-7][0-9A-F]"
    f"|(?:C[2-9A-F]|D[0-9A-F]){_UTF8_CONT}"
    f"|E0[AB][0-9A-F]{_UTF8_CONT}"
    f"|E[1-9A-C]{_UTF8_CONT}{_UTF8_CONT}"
    f"|ED[89][0-9A-F]{_UTF8_CONT}"
    f"|E[EF]{_UTF8_CONT}{_UTF8_CONT}"
    f"|F0[9AB][0-9A-F]{_UTF8_CONT}{_UTF8_CONT}"
    f"|F[1-3]{_UTF8_CONT}{_UTF8_CONT}{_UTF8_CONT}"
    f"|F48[0-9A-F]{_UTF8_CONT}{_UTF8_CONT})*"
)
_UTF8_HEX_RE = f"^{_UTF8_HEX_BODY}$"

#: hex of ``b"HTTP/"`` — the content-block sniff for the HTTP split.
_HTTP_MAGIC_HEX = "485454502F"

#: HTTP field patterns, shared verbatim across the Spark expression
#: path, the DuckDB twin, and the Python kernel (Java / RE2 / re agree
#: on this subset).
_HTTP_STATUS_RE = r"^HTTP/[0-9.]+ ([0-9]{3})"
_HTTP_CTYPE_RE = r"(?i)content-type:[ \t]*([^\r\n;]+)"

#: WARC record types the documents adapter ingests by default:
#: ``response`` (WARC shards, HTTP payloads) and ``conversion`` (WET
#: shards, pre-extracted text).
_DEFAULT_RECORD_TYPES = ("response", "conversion")

_MEMBER_ARR_DDL = (
    "array<struct<off:bigint,fname:string,blen:bigint,boff:bigint,isize:bigint>>"
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("member_no", T.IntegerType()),
        T.StructField("member_off", T.LongType()),
        T.StructField("fname", T.StringType()),
        T.StructField("rec_bytes", T.LongType()),
        T.StructField("isize", T.LongType()),
        T.StructField("warc_version", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
    ]
)

#: Shared output shape of BOTH documents adapters — field-for-field
#: cross-checked on the stored subset in tests.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("rec_bytes", T.LongType()),
    ]
)


def _exploded_members(media: DataFrame) -> DataFrame:
    """Shared first half of the WARC expression projections: the
    bounded member walk (see ``warc_stored_records``) exploded to one
    row per stored member, with the hex view staged as ``__h``, the
    member ordinal ``member_no``, the member struct ``m``
    (off/fname/blen/boff/isize) and the record's header-block hex
    staged as ``__hh`` (the alignment-safe boundary regex over a
    bounded window) — staged columns so downstream field regexes never
    re-inline the walk.
    """
    h = F.hex("payload")
    n = F.length("payload").cast("long")

    def u8(p: F.Column) -> F.Column:
        return F.conv(F.substr(h, p * 2 - 1, F.lit(2)), 16, 10).cast("long")

    def le(p: F.Column, nb: int) -> F.Column:
        pairs = [F.substr(h, (p + i) * 2 - 1, F.lit(2)) for i in range(nb)]
        return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("long")

    def walk_step(acc, _):
        p = acc["p"]
        magic_ok = F.substr(h, p * 2 - 1, F.lit(6)) == F.lit("1F8B08")
        flg = u8(p + 3)
        has_name = flg == 8
        fs = p + 10
        hits = F.filter(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(_NAME_BUDGET - 1).cast("long")),
                lambda i: F.struct(
                    i.alias("i"),
                    (
                        ((fs + i) * 2 <= F.length(h))
                        & (F.substr(h, (fs + i) * 2 - 1, F.lit(2)) == F.lit("00"))
                    ).alias("z"),
                ),
            ),
            lambda e: e["z"],
        )
        name_len = F.try_element_at(hits, F.lit(1))["i"]
        hs = F.when(has_name, fs + name_len + 1).otherwise(fs)
        blk = u8(hs)
        blen = le(hs + 1, 2)
        nlen = le(hs + 3, 2)
        boff = hs + 5
        good = (
            acc["ok"]
            & magic_ok
            & flg.isin(0, 8)
            & (~has_name | name_len.isNotNull())
            & (blk % 2 == 1)                       # BFINAL
            & (F.floor(blk / 2).cast("long") % 4 == 0)  # BTYPE = stored
            & (nlen == F.lit(65535) - blen)
            & (boff + blen + 7 <= n)               # body + 8-byte trailer
        )
        fname_hex = F.substr(h, fs * 2 - 1, name_len * 2)
        fname = F.when(
            has_name & name_len.isNotNull() & fname_hex.rlike(_ASCII_HEX_RE),
            F.decode(F.unhex(fname_hex), "UTF-8"),
        )
        member = F.struct(
            (p - 1).alias("off"),                  # 0-based payload offset
            fname.alias("fname"),
            blen.alias("blen"),
            boff.alias("boff"),
            le(boff + blen + 4, 4).alias("isize"),
        )
        return F.when(
            F.coalesce(good, F.lit(False)),
            F.struct(
                (boff + blen + 8).alias("p"),
                F.concat(acc["ms"], F.array(member)).alias("ms"),
                F.lit(True).alias("ok"),
            ),
        ).otherwise(
            F.struct(acc["p"].alias("p"), acc["ms"].alias("ms"), F.lit(False).alias("ok"))
        )

    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_WARC_MEMBER_BUDGET)),
        F.struct(
            F.lit(1).cast("long").alias("p"),
            F.expr(f"CAST(array() AS {_MEMBER_ARR_DDL})").alias("ms"),
            F.lit(True).alias("ok"),
        ),
        walk_step,
    )
    exploded = media.select(
        "media_id", h.alias("__h"), walked["ms"].alias("__ms")
    ).select("media_id", "__h", F.posexplode("__ms").alias("member_no", "m"))
    boff, blen = F.col("m.boff"), F.col("m.blen")
    window = F.substr(
        F.col("__h"), boff * 2 - 1, F.least(blen, F.lit(_HDR_WINDOW_BYTES)) * 2
    )
    hdr_hex = F.regexp_extract(window, _HDR_BOUNDARY_RE, 1)
    return exploded.select(
        "media_id", "__h", "member_no", "m", hdr_hex.alias("__hh")
    )


def _hdr_col() -> F.Column:
    """ASCII-gated decoded header block over the staged ``__hh``."""
    hh = F.col("__hh")
    return F.when(hh.rlike(_ASCII_HEX_RE), F.decode(F.unhex(hh), "UTF-8"))


def _hdr_field(hdr: F.Column, pattern: str) -> F.Column:
    return F.nullif(F.regexp_extract(hdr, pattern, 1), F.lit(""))


def warc_stored_records(media: DataFrame) -> DataFrame:
    """Segment concatenated STORED-deflate gzip members and parse each
    member's WARC header block — one output row per member, all in
    whole-stage codegen (see module docstring for the contract).

    Walk state is (position, members-so-far, still-valid): each step
    verifies the member magic (1F 8B 08), reads FLG (only 0 / FNAME
    supported — the shapes crawl writers emit), scans the FNAME
    zero-terminator within ``_NAME_BUDGET``, requires a single FINAL
    stored block (BTYPE=00, BFINAL=1, NLEN = ~LEN) fully present
    including the 8-byte trailer, appends the member and jumps past
    it.  Any violation stops the walk with prior members intact.

    Truncated hex reads degrade by the family's ``conv('')`` → NULL
    contract; FNAME and the header block are ASCII-gated on their hex
    view (spec-compliant), so invalid UTF-8 yields NULL identically in
    both engines instead of replacement-vs-error divergence.
    """
    ex = _exploded_members(media)
    hdr = _hdr_col()
    return ex.select(
        "media_id",
        F.col("member_no").cast("int").alias("member_no"),
        F.col("m.off").alias("member_off"),
        F.col("m.fname").alias("fname"),
        F.col("m.blen").alias("rec_bytes"),
        F.col("m.isize").alias("isize"),
        _hdr_field(hdr, r"^(WARC/[0-9.]+)").alias("warc_version"),
        _hdr_field(hdr, r"WARC-Type: ([^\r\n]+)").alias("warc_type"),
        _hdr_field(hdr, r"WARC-Target-URI: ([^\r\n]+)").alias("target_uri"),
        _hdr_field(hdr, r"Content-Length: ([0-9]+)").cast("long").alias(
            "content_length"
        ),
    )


#: Record-content decode budget (bytes) for the documents adapters —
#: bounds the hex substring / retained slice a single record's content
#: may cost.  Applies to the WHOLE content block (HTTP headers + body
#: on response records).
_TEXT_BUDGET = 16384


def _documents_projection(media: DataFrame) -> DataFrame:
    """Shared core of the expression documents adapter: one row per
    walked member with ``(doc_id, warc_type, target_uri, is_http,
    http_status, content_type, body_bytes, text, rec_bytes)`` — all
    scan-local hex arithmetic, HTTP-aware (see module docstring).

    Staging discipline (the m11 codegen lesson): the content hex
    ``__ch``, the HTTP header-block hex ``__phh``, the decoded HTTP
    header ``__httph`` and the body hex ``__bh`` are each materialized
    in their own ``select`` so no multiply-referenced non-cheap
    expression re-inlines upstream work.
    """
    ex = _exploded_members(media)
    hdr = _hdr_col()
    hdr_len = (F.length("__hh") / 2).cast("long")
    content_length = _hdr_field(hdr, r"Content-Length: ([0-9]+)").cast("long")
    fits = (
        content_length.isNotNull()
        & (F.col("__hh") != F.lit(""))
        & (content_length <= F.lit(_TEXT_BUDGET))
        & (hdr_len + 4 + content_length <= F.col("m.blen"))
    )
    staged = ex.select(
        "media_id",
        "member_no",
        F.col("m.blen").alias("rec_bytes"),
        _hdr_field(hdr, r"WARC-Type: ([^\r\n]+)").alias("warc_type"),
        _hdr_field(hdr, r"WARC-Target-URI: ([^\r\n]+)").alias("target_uri"),
        content_length.alias("__clen"),
        F.when(
            fits,
            F.substr(
                F.col("__h"),
                (F.col("m.boff") + hdr_len + 4) * 2 - 1,
                content_length * 2,
            ),
        ).alias("__ch"),
    )
    sniffed = staged.select(
        "*",
        F.coalesce(
            F.col("__ch").startswith(_HTTP_MAGIC_HEX), F.lit(False)
        ).alias("is_http"),
    ).select(
        "*",
        F.when(
            F.col("is_http"), F.regexp_extract("__ch", _HDR_BOUNDARY_RE, 1)
        ).alias("__phh"),
    )
    with_http_hdr = sniffed.select(
        "*",
        F.when(
            (F.col("__phh") != "") & F.col("__phh").rlike(_ASCII_HEX_RE),
            F.decode(F.unhex("__phh"), "UTF-8"),
        ).alias("__httph"),
    )
    body_hex = F.when(
        F.col("is_http") & (F.col("__phh") != ""),
        F.substr(
            F.col("__ch"),
            F.length("__phh") + 9,
            F.col("__clen") * 2 - F.length("__phh") - 8,
        ),
    ).when(~F.col("is_http"), F.col("__ch"))
    body_bytes = (
        F.when(
            F.col("is_http") & (F.col("__phh") != ""),
            F.col("__clen") - (F.length("__phh") / 2).cast("long") - 4,
        )
        .when(~F.col("is_http"), F.col("__clen"))
    )
    projected = with_http_hdr.select(
        (F.col("media_id") * _DOC_ID_BASE + F.col("member_no"))
        .cast("long")
        .alias("doc_id"),
        "warc_type",
        "target_uri",
        "is_http",
        F.nullif(F.regexp_extract("__httph", _HTTP_STATUS_RE, 1), F.lit(""))
        .cast("int")
        .alias("http_status"),
        F.nullif(
            F.trim(F.regexp_extract("__httph", _HTTP_CTYPE_RE, 1)), F.lit("")
        ).alias("content_type"),
        body_bytes.alias("body_bytes"),
        body_hex.alias("__bh"),
        "rec_bytes",
    )
    finished = projected.select(
        "*",
        F.when(
            F.col("__bh").rlike(_UTF8_HEX_RE), F.decode(F.unhex("__bh"), "UTF-8")
        ).alias("text"),
    ).drop("__bh")
    # Materialization barrier: re-emit each finished row through
    # inline(array(struct(...))).  Downstream FILTERS (the ingest gate,
    # m14's is_http gate) reference generator output, so Catalyst
    # cannot push them through this Generate and substitute the
    # aliases — without it, PushDownPredicate rewrites the filter in
    # terms of the full walk/split/UTF-8-gate expression chains and
    # every row pays them twice (no codegen CSE across Filter/Project
    # here: higher-order functions keep this plan interpreted).
    # Measured on the committed fixture: 4.6 s → ~2 s.
    return finished.select(
        F.inline(F.array(F.struct(*[F.col(c) for c in finished.columns])))
    )


def warc_text_documents(
    media: DataFrame,
    record_types: tuple[str, ...] = _DEFAULT_RECORD_TYPES,
) -> DataFrame:
    """Adapter from WARC/WET shards to the ``documents`` shape: one row
    per ingestible record — ``(doc_id, target_uri, http_status,
    content_type, text, rec_bytes)`` — the crawl front-door that feeds
    the corpus-prep gates (ll15).

    HTTP-aware: ``response`` content starting with ``HTTP/`` is split
    at the second CRLF CRLF into status line + headers vs body; only
    status-200 bodies ingest (non-200, malformed-header and
    unparseable-status records drop).  Content without an HTTP block —
    WET ``conversion`` records and pre-split bare-body archives —
    ingests whole with NULL http fields.  ``text`` is the body under
    the WELL-FORMED-UTF-8 gate within ``_TEXT_BUDGET``; ``doc_id``
    packs (media_id, member_no) on ``_DOC_ID_BASE``.

    This is the oracle-checkable expression leg (bounded by the
    member-walk budget); ``warc_text_records`` is the kernel twin that
    handles compressed members and unbounded member counts at scale.
    """
    proj = _documents_projection(media)
    return proj.filter(
        F.col("warc_type").isin(*record_types)
        & F.col("target_uri").isNotNull()
        & F.col("text").isNotNull()
        & (~F.col("is_http") | (F.col("http_status") == 200))
    ).select(
        "doc_id", "target_uri", "http_status", "content_type", "text", "rec_bytes"
    )


def warc_http_response_meta(media: DataFrame) -> DataFrame:
    """HTTP transaction metadata per ``response`` record whose content
    carries an HTTP block (m14): ``(doc_id, target_uri, http_status,
    content_type, body_bytes, utf8_ok)``.  Unlike the documents
    adapter this keeps non-200 and malformed rows — a crawl-health
    view (status mix, content-type mix, undecodable-body rate), with
    NULL status/type/body on records whose HTTP header block never
    terminates or is non-ASCII (the family's NULL contract).
    """
    proj = _documents_projection(media)
    return proj.filter(
        F.col("is_http") & (F.col("warc_type") == "response")
    ).select(
        "doc_id",
        "target_uri",
        "http_status",
        "content_type",
        "body_bytes",
        F.col("text").isNotNull().alias("utf8_ok"),
    )


# ---------------------------------------------------------------------------
# zlib kernel path (mapInPandas, Arrow-batched)
# ---------------------------------------------------------------------------

#: Inflated bytes RETAINED per member in the kernels — headers + the
#: documents-adapter content budget live comfortably inside this; the
#: remainder of an oversized record is counted but not kept.
_REC_KEEP = 1 << 20

#: Hard cap on TOTAL inflated bytes per member (deflate-bomb guard):
#: past this the stream is treated like a corrupt member and the walk
#: stops (the boundary past an un-inflated stream is unknowable).
#: Legitimate WARC records run well below 256 MiB.
_REC_INFLATE_CAP = 1 << 28

#: Per-call inflate chunk — bounds the transient allocation.
_ZLIB_CHUNK = 1 << 16


def _parse_member_header(buf: bytes, p: int) -> tuple[str | None, int] | None:
    """Parse one RFC 1952 member header at offset ``p``; returns
    (fname, deflate_stream_offset) or None if not a member header."""
    if len(buf) < p + 10 or buf[p : p + 3] != b"\x1f\x8b\x08":
        return None
    flg = buf[p + 3]
    q = p + 10
    if flg & 4:  # FEXTRA
        if len(buf) < q + 2:
            return None
        (xlen,) = struct.unpack_from("<H", buf, q)
        q += 2 + xlen
    fname = None
    if flg & 8:  # FNAME
        end = buf.find(b"\x00", q)
        if end < 0:
            return None
        raw = buf[q:end]
        if all(b < 0x80 for b in raw):  # the family's ASCII gate
            fname = raw.decode("ascii")
        q = end + 1
    if flg & 16:  # FCOMMENT
        end = buf.find(b"\x00", q)
        if end < 0:
            return None
        q = end + 1
    if flg & 2:  # FHCRC
        q += 2
    return fname, q


def _inflate_member(
    mv: memoryview, q: int, total_len: int
) -> tuple[bytes, int, int] | None:
    """Inflate one member's raw-deflate stream starting at ``q`` with
    BOUNDED memory and work: at most ``_REC_KEEP`` inflated bytes are
    retained, at most ``_REC_INFLATE_CAP`` inflated at all.  The
    memoryview slice avoids copying the shard remainder per member
    (a bytes slice would make the walk O(members × shard_bytes)).
    Returns (kept_prefix, total_inflated_len, trailer_offset), or None
    on a truncated / corrupt / bomb-sized stream.
    """
    d = zlib.decompressobj(-15)
    data: memoryview | bytes = mv[q:]
    kept: list[bytes] = []
    kept_len = 0
    total = 0
    while True:
        try:
            piece = d.decompress(data, _ZLIB_CHUNK)
        except zlib.error:
            return None
        total += len(piece)
        if total > _REC_INFLATE_CAP:
            return None
        if piece and kept_len < _REC_KEEP:
            take = piece[: _REC_KEEP - kept_len]
            kept.append(take)
            kept_len += len(take)
        if d.eof:
            break
        data = d.unconsumed_tail
        if not piece and not data:  # needs more input: truncated stream
            return None
    return b"".join(kept), total, total_len - len(d.unused_data)


def _walk_members(
    buf: bytes,
) -> Iterator[tuple[int, int, str | None, bytes, int, int]]:
    """Shared kernel member walk: yields
    (member_no, member_off, fname, kept_record_prefix, total_len,
    isize) for every decodable member, stopping at the first
    non-member / truncated / oversized stream (prior members intact —
    the expression walk's contract)."""
    mv = memoryview(buf)
    p, member_no = 0, 0
    while True:
        parsed = _parse_member_header(buf, p)
        if parsed is None:
            return
        fname, q = parsed
        inflated = _inflate_member(mv, q, len(buf))
        if inflated is None:
            return
        rec, total, tail_off = inflated
        if tail_off + 8 > len(buf):
            return
        isize = struct.unpack_from("<I", buf, tail_off + 4)[0]
        yield member_no, p, fname, rec, total, isize
        member_no += 1
        p = tail_off + 8


def _parse_warc_header(rec: bytes) -> tuple[str | None, str | None, str | None, int | None]:
    """Extract (version, type, uri, content_length) from a record's
    header block — same window/ASCII contract as the expression path."""
    window = rec[: _HDR_WINDOW_BYTES]
    cut = window.find(b"\r\n\r\n")
    if cut < 0:
        return None, None, None, None
    blk = window[:cut]
    if any(b >= 0x80 for b in blk):
        return None, None, None, None
    text = blk.decode("ascii")

    def grab(pat: str) -> str | None:
        m = re.search(pat, text)
        return m.group(1) if m else None

    clen = grab(r"Content-Length: ([0-9]+)")
    return (
        grab(r"^(WARC/[0-9.]+)"),
        grab(r"WARC-Type: ([^\r\n]+)"),
        grab(r"WARC-Target-URI: ([^\r\n]+)"),
        int(clen) if clen is not None else None,
    )


def _http_split(
    content: bytes,
) -> tuple[int | None, str | None, bytes | None, bool]:
    """Kernel twin of the expression HTTP split: returns
    (http_status, content_type, body, is_http) with the SAME field
    regexes and ASCII header gate; body is None when the content looks
    HTTP but its header block never terminates."""
    if not content.startswith(b"HTTP/"):
        return None, None, content, False
    cut = content.find(b"\r\n\r\n")
    if cut < 0:
        return None, None, None, True
    blk = content[:cut]
    status: int | None = None
    ctype: str | None = None
    if all(b < 0x80 for b in blk):
        text = blk.decode("ascii")
        m = re.search(_HTTP_STATUS_RE, text)
        status = int(m.group(1)) if m else None
        m = re.search(_HTTP_CTYPE_RE, text)
        ctype = (m.group(1).strip(" ") or None) if m else None
    return status, ctype, content[cut + 4 :], True


def warc_records(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """General WARC segmentation: REAL stdlib-``zlib`` inflation of
    every concatenated member (any deflate shape — compressed,
    multi-block, stored) in an Arrow-batched ``mapInPandas`` kernel.
    Python cost is per BATCH, partition-parallel, no driver collection
    — the at-scale path for genuine crawl shards, value-cross-checked
    against ``warc_stored_records`` on the stored subset in tests.
    Memory per member is bounded (``_REC_KEEP`` retained /
    ``_REC_INFLATE_CAP`` total — see module docstring).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                for member_no, off, fname, rec, total, isize in _walk_members(
                    bytes(payload)
                ):
                    ver, typ, uri, clen = _parse_warc_header(rec)
                    rows.append(
                        (mid, member_no, off, fname, total, isize, ver, typ, uri, clen)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, schema=RECORD_SCHEMA)


def warc_text_records(
    media: DataFrame,
    record_types: tuple[str, ...] = _DEFAULT_RECORD_TYPES,
    payload_col: str = "payload",
) -> DataFrame:
    """Kernel twin of ``warc_text_documents`` — the 100 TB text leg
    (ll16): zlib-inflates EVERY member (compressed shards, unbounded
    member counts), applies the SAME header-window / Content-Length /
    text-budget / HTTP-split / status-200 / well-formed-UTF-8 contract
    byte-for-byte, and emits the shared ``DOCUMENT_SCHEMA``.  On the
    stored/in-budget subset the output equals the expression path's
    field-for-field (pytest-pinned); beyond it, this is the path the
    ll14-style streaming chain consumes compressed shards through.
    """
    types = set(record_types)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                for member_no, _off, _fn, rec, total, _isize in _walk_members(
                    bytes(payload)
                ):
                    if member_no >= _DOC_ID_BASE:  # doc_id packing headroom
                        break
                    _ver, typ, uri, clen = _parse_warc_header(rec)
                    if typ not in types or uri is None or clen is None:
                        continue
                    cut = rec[:_HDR_WINDOW_BYTES].find(b"\r\n\r\n")
                    start = cut + 4
                    if (
                        clen > _TEXT_BUDGET
                        or start + clen > total
                        or start + clen > len(rec)  # content past _REC_KEEP
                    ):
                        continue
                    status, ctype, body, is_http = _http_split(
                        rec[start : start + clen]
                    )
                    if body is None or (is_http and status != 200):
                        continue
                    try:
                        text = body.decode("utf-8")  # strict ⟺ _UTF8_HEX_RE
                    except UnicodeDecodeError:
                        continue
                    rows.append(
                        (
                            mid * _DOC_ID_BASE + member_no,
                            uri,
                            status,
                            ctype,
                            text,
                            total,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOCUMENT_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, schema=DOCUMENT_SCHEMA)
