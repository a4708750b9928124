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
- ``warc_records`` — the GENERAL path: an Arrow-batched ``mapInPandas``
  kernel that inflates every member with stdlib ``zlib`` (REAL
  decompression, no external codec needed), so compressed and
  multi-block members parse too.  Same output schema; the stored
  subset is pytest-cross-checked against the expression kernel.

Both parse only the WARC HEADER BLOCK (ASCII by spec) — version,
WARC-Type, WARC-Target-URI, Content-Length — never decoding record
content, so binary response bodies cannot poison the string path.  The
header/content boundary (CRLF CRLF) is located in the HEX view with
byte alignment enforced by a ``(?:[0-9A-F]{2})*?`` lazy walk, inside a
bounded ``_HDR_WINDOW_BYTES`` prefix.

Reference parity: the reference's ingest reads pre-split JSON events
(Bronze1.py:87-94); WARC segmentation is part of the beyond-reference
LLM-pipeline surface (SURVEY §2.10), feeding the ll14-style gates.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Member-walk budget per payload for the EXPRESSION kernel: each fold
#: step consumes one whole member.  Shards with more members report the
#: first ``_WARC_MEMBER_BUDGET`` (the zlib kernel has no such cap — at
#: real shard sizes it is the scale path anyway).
_WARC_MEMBER_BUDGET = 6

#: FNAME zero-terminator scan budget (bytes), the m09 convention.
_NAME_BUDGET = 64

#: The WARC header block must terminate (CRLF CRLF) within this many
#: bytes of the record start; real WARC headers are a few hundred
#: bytes.  Past the window → NULL header fields.
_HDR_WINDOW_BYTES = 1024

#: hex-alignment-safe "prefix up to the first CRLF CRLF" pattern: the
#: lazy two-hex-digit group can only stop on byte boundaries, so a
#: 0D0A0D0A straddling two bytes can never match.
_HDR_BOUNDARY_RE = "^((?:[0-9A-F]{2})*?)0D0A0D0A"

#: all-ASCII gate over a hex view (first nibble 0-7 ⟺ byte < 0x80).
_ASCII_HEX_RE = "^([0-7][0-9A-F])*$"

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


def _exploded_members(media: DataFrame) -> DataFrame:
    """Shared first half of both WARC projections: the bounded member
    walk (see ``warc_stored_records``) exploded to one row per stored
    member, with the hex view staged as ``__h``, the member ordinal
    ``member_no``, the member struct ``m`` (off/fname/blen/boff/isize)
    and the record's header-block hex staged as ``__hh`` (the
    alignment-safe boundary regex over a bounded window) — staged
    columns so downstream field regexes never re-inline the walk.
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


#: Record-content decode budget (bytes) for ``warc_text_documents`` —
#: the documents-adapter leg; real page text at corpus scale routes
#: through the zlib kernel, the expression leg is the oracle gate.
_TEXT_BUDGET = 16384


def warc_text_documents(media: DataFrame) -> DataFrame:
    """Adapter from WARC shards to the ``documents`` shape: one row per
    RESPONSE record with a resolvable Target-URI and fully-present
    ASCII content — ``(doc_id, target_uri, text, rec_bytes)`` — the
    crawl front-door that feeds the corpus-prep gates (ll15).

    Content extraction is pure scan-local hex arithmetic like the rest
    of the walk: the content bytes start right after the header block's
    CRLF CRLF (header length = the staged boundary-regex match length),
    run for the declared Content-Length, and decode under the family's
    ASCII gate within ``_TEXT_BUDGET``.  ``doc_id`` packs
    (media_id, member_no) as ``media_id * 100 + member_no`` (the walk
    budget bounds member_no far below 100).
    """
    ex = _exploded_members(media)
    hdr = _hdr_col()
    blen = F.col("m.blen")
    hdr_len = (F.length("__hh") / 2).cast("long")
    content_length = _hdr_field(hdr, r"Content-Length: ([0-9]+)").cast("long")
    fits = (
        content_length.isNotNull()
        & (F.col("__hh") != F.lit(""))
        & (content_length <= F.lit(_TEXT_BUDGET))
        & (hdr_len + 4 + content_length <= blen)
    )
    content_hex = F.substr(
        F.col("__h"), (F.col("m.boff") + hdr_len + 4) * 2 - 1, content_length * 2
    )
    text = F.when(
        fits & content_hex.rlike(_ASCII_HEX_RE),
        F.decode(F.unhex(content_hex), "UTF-8"),
    )
    return (
        ex.select(
            (F.col("media_id") * 100 + F.col("member_no")).cast("long").alias("doc_id"),
            _hdr_field(hdr, r"WARC-Type: ([^\r\n]+)").alias("warc_type"),
            _hdr_field(hdr, r"WARC-Target-URI: ([^\r\n]+)").alias("target_uri"),
            text.alias("text"),
            blen.alias("rec_bytes"),
        )
        .filter(
            (F.col("warc_type") == "response")
            & F.col("target_uri").isNotNull()
            & F.col("text").isNotNull()
        )
        .drop("warc_type")
    )


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
    import re

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


def warc_records(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """General WARC segmentation: REAL stdlib-``zlib`` inflation of
    every concatenated member (any deflate shape — compressed,
    multi-block, stored) in an Arrow-batched ``mapInPandas`` kernel.
    Python cost is per BATCH, partition-parallel, no driver collection
    — the at-scale path for genuine crawl shards, value-cross-checked
    against ``warc_stored_records`` on the stored subset in tests.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                buf = bytes(payload)
                p, member_no = 0, 0
                while True:
                    parsed = _parse_member_header(buf, p)
                    if parsed is None:
                        break
                    fname, q = parsed
                    d = zlib.decompressobj(-15)
                    try:
                        rec = d.decompress(buf[q:])
                    except zlib.error:
                        break
                    if not d.eof:  # truncated deflate stream
                        break
                    tail_off = len(buf) - len(d.unused_data)
                    if tail_off + 8 > len(buf):
                        break
                    isize = struct.unpack_from("<I", buf, tail_off + 4)[0]
                    ver, typ, uri, clen = _parse_warc_header(rec)
                    rows.append(
                        (mid, member_no, p, fname, len(rec), isize, ver, typ, uri, clen)
                    )
                    member_no += 1
                    p = tail_off + 8
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, schema=RECORD_SCHEMA)
