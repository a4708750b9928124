"""Round-14 operators: the HTTP-real WARC front-door (HTTP split,
status/content-type surface, WET conversion records), the
well-formed-UTF-8 content gate, the bounded/memoryview zlib kernel
(deflate-bomb guard, retained-prefix cap), the ll16 kernel documents
adapter cross-checked against the ll15 expression path, and the
ASCII-boundary marker-pattern contract."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F

import realtimechurnpredictiondataengineering_spark.functions.text as tx
from realtimechurnpredictiondataengineering_spark.operators import warc

FIX = "fixtures"


def _rows(spark, path):
    return spark.read.parquet(f"{FIX}/{path}")


def _warc_media(spark):
    return _rows(spark, "warc_members.parquet")


# --- well-formed-UTF-8 hex gate ---------------------------------------------


def test_utf8_hex_gate_equals_python_strict_decode(spark):
    # the RFC 3629 hex grammar must accept EXACTLY the byte strings
    # Python's strict utf-8 decode accepts (the kernel path relies on
    # that equivalence) — exercised over every interesting boundary
    samples = [
        b"",
        b"plain ascii",
        "café".encode(),                      # 2-byte
        "東京".encode(),                   # 3-byte CJK
        "\U0001f600".encode(),                     # 4-byte emoji
        "å".encode(),                        # combining mark
        "߿ࠀ퟿".encode(),       # class edges
        "\U00010000\U0010ffff".encode(),           # plane edges
        b"\x80",                                   # lone continuation
        b"\xc2",                                   # truncated 2-byte
        b"\xc0\xaf",                               # overlong 2-byte
        b"\xc1\xbf",                               # overlong 2-byte
        b"\xe0\x80\xaf",                           # overlong 3-byte
        b"\xed\xa0\x80",                           # surrogate
        b"\xed\xbf\xbf",                           # surrogate
        b"\xf0\x80\x80\x80",                       # overlong 4-byte
        b"\xf4\x90\x80\x80",                       # > U+10FFFF
        b"\xf5\x80\x80\x80",                       # invalid lead
        b"\xfe\xff",                               # invalid leads
        b"ok then \xe9 latin-1",                   # stray byte mid-text
        b"\xe6\x9d\xb1\xe4\xba",                   # truncated CJK tail
    ]
    df = spark.createDataFrame(
        [(i, s.hex().upper()) for i, s in enumerate(samples)], "i int, h string"
    )
    got = {
        r["i"]: r["ok"]
        for r in df.select(
            "i", F.col("h").rlike(warc._UTF8_HEX_RE).alias("ok")
        ).collect()
    }
    for i, s in enumerate(samples):
        try:
            s.decode("utf-8")
            expected = True
        except UnicodeDecodeError:
            expected = False
        assert got[i] == expected, (i, s)


def test_marker_pattern_ascii_boundary_contract(spark):
    # Java \b is Unicode-aware (a combining mark suppresses the
    # boundary) while RE2 \b is ASCII — the java=True lookaround
    # spelling pins BOTH engines to ASCII boundaries: identical on
    # ASCII text, and counting "a" + U+030A as a hit like RE2 does
    df = spark.createDataFrame(
        [
            (1, "a plain hit"),
            (2, "ab is not a hit ax"),
            (3, "å combining-adjacent"),     # RE2 counts this
            (4, "the, punctuated"),
        ],
        "i int, text string",
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", tx.marker_hits("text", tx.EN_STOPWORDS).alias("n")
        ).collect()
    }
    assert got[1] == 1          # the standalone 'a'
    assert got[2] == 2          # 'is' and the standalone 'a'; 'ab'/'ax' never
    assert got[3] == 1          # ASCII boundary: combining mark is non-word
    assert got[4] == 1          # 'the,' still word-bounded


def test_marker_pattern_cross_engine_count_parity(spark):
    # the strongest form of the boundary contract: Spark's java
    # spelling must count EXACTLY like DuckDB's RE2 ASCII-\b spelling
    # on fuzzed text mixing markers with punctuation, CJK, accented
    # letters and combining marks
    import random

    import duckdb

    random.seed(7)
    toks = ["the", "a", "an", "it", "o", "x", "café", "å", "an,a",
            "the.", "a-b", "ab", "的a", "a的", "é a é"]
    texts = [
        " ".join(random.choice(toks) for _ in range(random.randint(1, 25)))
        + random.choice(["", " 的是", " é"])
        for _ in range(200)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    con = duckdb.connect()
    for words in (tx.EN_STOPWORDS,) + tuple(tx.LANG_MARKERS.values()):
        got = (
            df.select(F.sum(tx.marker_hits("text", words)).alias("n"))
            .collect()[0]["n"]
        )
        pat = tx.marker_pattern(words).replace("'", "''")
        want = sum(
            con.execute(
                f"SELECT len(regexp_extract_all(lower(?), '{pat}'))", [t]
            ).fetchone()[0]
            for t in texts
        )
        assert got == want, (words[0], got, want)


# --- HTTP split (expression path) -------------------------------------------


def test_http_response_meta_covers_every_branch(spark):
    meta = {
        r["doc_id"]: r
        for r in warc.warc_http_response_meta(_warc_media(spark)).collect()
    }
    edge = 9800 + 32
    base = warc._DOC_ID_BASE

    def row(mid):
        return meta[mid * base]

    r404 = row(edge + 8)
    assert (r404["http_status"], r404["content_type"], r404["utf8_ok"]) == (
        404, "text/html", True
    )
    r301 = row(edge + 9)
    assert (r301["http_status"], r301["content_type"], r301["body_bytes"]) == (
        301, None, 0
    )
    rnoterm = row(edge + 10)  # header block never terminates
    assert (rnoterm["http_status"], rnoterm["content_type"],
            rnoterm["body_bytes"], rnoterm["utf8_ok"]) == (None, None, None, False)
    rlatin = row(edge + 11)   # 200 but body is not UTF-8
    assert (rlatin["http_status"], rlatin["utf8_ok"]) == (200, False)
    rodd = row(edge + 14)     # unparseable status line
    assert (rodd["http_status"], rodd["content_type"]) == (None, "text/html")
    # bare-body response carries no HTTP block → NOT in the meta view
    assert (edge + 12) * base not in meta


def test_warc_ingest_filters_and_wet_records(spark):
    docs = {
        r["doc_id"]: r
        for r in warc.warc_text_documents(_warc_media(spark)).collect()
    }
    edge = 9800 + 32
    base = warc._DOC_ID_BASE
    # non-200 / malformed / invalid-UTF-8 responses never ingest
    for mid in (edge + 8, edge + 9, edge + 10, edge + 11, edge + 14):
        assert mid * base not in docs
    # the bare-body degenerate case still ingests, with NULL http meta
    bare = docs[(edge + 12) * base]
    assert bare["http_status"] is None and bare["content_type"] is None
    assert bare["text"] == "bare body no http wrapper é"
    # WET conversion records ingest whole (members 1 and 2 of edge+13)
    wet1 = docs[(edge + 13) * base + 1]
    assert wet1["text"] == "extracted page text 東京 ok"
    assert (edge + 13) * base + 2 in docs
    # the warcinfo lead member of the WET shard does not
    assert (edge + 13) * base not in docs
    # record_types is honored: response-only drops the conversions
    resp_only = {
        r["doc_id"]
        for r in warc.warc_text_documents(
            _warc_media(spark), record_types=("response",)
        ).collect()
    }
    assert (edge + 13) * base + 1 not in resp_only
    assert (edge + 12) * base in resp_only


# --- ll16 kernel documents adapter ------------------------------------------


def test_text_records_kernel_matches_expression_on_stored_subset(spark):
    media = _warc_media(spark)
    expr = {r["doc_id"]: r for r in warc.warc_text_documents(media).collect()}
    kern = {r["doc_id"]: r for r in warc.warc_text_records(media).collect()}
    assert expr, "expression adapter found no documents"
    # field-for-field: every expression doc appears identically in the
    # kernel output (same doc_id packing, same split, same gates)
    for doc_id, e in expr.items():
        k = kern[doc_id]
        for f in ("target_uri", "http_status", "content_type", "text", "rec_bytes"):
            assert e[f] == k[f], (doc_id, f, e[f], k[f])
    # the kernel also ingests the out-of-expression-contract members:
    # the COMPRESSED member (edge+1) and the MULTI-BLOCK member (edge)
    edge = 9800 + 32
    base = warc._DOC_ID_BASE
    extra = set(kern) - set(expr)
    assert (edge + 1) * base in extra
    assert edge * base + 1 in extra
    big = kern[(edge + 1) * base]
    assert big["http_status"] == 200 and big["text"].startswith("payload éè ")


def test_inflate_member_bounds_bombs_and_keeps_prefix(monkeypatch):
    rec = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u:1\r\n" \
          b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    big = rec + b"\x00" * 5000  # inflates past a tiny cap

    def member(data: bytes) -> bytes:
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        return (
            b"\x1f\x8b\x08\x00" + b"\x00" * 6
            + comp.compress(data) + comp.flush()
            + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
        )

    payload = member(rec) + member(big) + member(rec)
    # uncapped: all three members walk, full record lengths reported
    walked = list(warc._walk_members(payload))
    assert [w[4] for w in walked] == [len(rec), len(big), len(rec)]
    # bomb cap: the oversized member stops the walk, prior members intact
    monkeypatch.setattr(warc, "_REC_INFLATE_CAP", 1000)
    assert [w[0] for w in warc._walk_members(payload)] == [0]
    # retained-prefix cap: the walk STILL reaches all members (totals
    # and boundaries exact), only the kept record text is truncated
    monkeypatch.setattr(warc, "_REC_INFLATE_CAP", 1 << 28)
    monkeypatch.setattr(warc, "_REC_KEEP", 64)
    capped = list(warc._walk_members(payload))
    assert [w[4] for w in capped] == [len(rec), len(big), len(rec)]
    assert all(len(w[3]) <= 64 for w in capped)


# --- AVI frame stats (m15) + the m02 real-decode leg ------------------------


def _avi_ground_truth(w, h, frame: bytes):
    stride = (3 * w + 3) // 4 * 4
    px = [frame[r * stride + c * 3 + k] for r in range(h) for c in range(w)
          for k in range(3)]
    n = w * h
    sb, sg, sr = sum(px[0::3]), sum(px[1::3]), sum(px[2::3])
    return n, sr / n, sg / n, sb / n, (0.299 * sr + 0.587 * sg + 0.114 * sb) / n


def test_avi_frame_stats_match_python_ground_truth(spark):
    from tools.gen_media_fixture import avi_frame
    from realtimechurnpredictiondataengineering_spark.operators import multimodal

    got = {
        (r["media_id"], r["frame_no"]): r
        for r in multimodal.avi_frame_stats(_rows(spark, "avi_frames.parquet")).collect()
    }
    assert got, "no frames decoded"
    checked = 0
    for i in range(36):
        if i % 9 == 8:
            continue
        mid = 9900 + i
        w, h, n_frames = 1 + i % 5, 1 + (i * 3) % 4, 1 + i % 3
        compressed = {1} if (i % 4 == 2 and n_frames > 1) else set()
        for k in range(n_frames):
            if k in compressed:
                assert (mid, k) not in got  # compressed: ordinal kept, no row
                continue
            r = got[(mid, k)]
            n, mr, mg, mb, ml = _avi_ground_truth(w, h, avi_frame(w, h, seed=i * 10 + k))
            assert (r["width"], r["height"], r["n_px"]) == (w, h, n)
            for have, want in ((r["mean_r"], mr), (r["mean_g"], mg),
                               (r["mean_b"], mb), (r["mean_luma"], ml)):
                assert abs(have - want) < 1e-12, (mid, k)
            checked += 1
    assert checked >= 40


def test_avi_frame_stats_edges(spark):
    from realtimechurnpredictiondataengineering_spark.operators import multimodal

    got = {
        (r["media_id"], r["frame_no"]): r
        for r in multimodal.avi_frame_stats(_rows(spark, "avi_frames.parquet")).collect()
    }
    edge = 9900 + 36
    # decoy fourccs inside pixel data: all 3 frames walk, stats real
    assert {(m, f) for m, f in got if m == edge} == {(edge, 0), (edge, 1), (edge, 2)}
    assert got[(edge, 1)]["n_px"] == 8
    # truncation INTO movi: the LIST's declared size overruns, the
    # bounded walk refuses it — zero frames (sizes can't be trusted)
    assert not any(m == edge + 1 for m, _ in got)
    # truncation confined to the trailing idx1: all frames decode
    assert {(m, f) for m, f in got if m == edge + 6} == {(edge + 6, 0), (edge + 6, 1)}
    # missing avih: frame enumerates with NULL geometry and stats
    r = got[(edge + 2, 0)]
    assert r["width"] is None and r["n_px"] is None and r["mean_r"] is None
    # all-compressed and non-AVI rows emit nothing
    assert not any(m in (edge + 3, edge + 4) for m, _ in got)
    # over-budget dims: geometry surfaces, stats NULL
    r = got[(edge + 5, 0)]
    assert (r["width"], r["height"], r["n_px"]) == (100, 100, None)


def test_sample_video_frames_decodes_uncompressed_avi_for_real(spark):
    from tools.gen_media_fixture import avi_bytes, avi_frame
    from realtimechurnpredictiondataengineering_spark.operators import multimodal

    frames = [avi_frame(3, 2, seed=s) for s in (1, 2, 3)]
    rows = [
        (1, bytearray(avi_bytes(3, 2, frames)), {"kind": "video", "format": "avi",
                                                 "n_bytes": 0}),
        (2, bytearray(b"not a video"), {"kind": "video", "format": "raw",
                                        "n_bytes": 11}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,n_bytes:long>",
    )
    got = [
        (r["media_id"], r["frame_no"], bytes(r["frame"]))
        for r in multimodal.sample_video_frames(df, every_n=2).collect()
    ]
    real = [(m, f, fr) for m, f, fr in got if m == 1]
    # every 2nd real frame, true ordinals, exact raw BGR bytes
    assert real == [(1, 0, frames[0]), (1, 2, frames[2])]
    # the non-AVI row keeps the documented stub
    assert [(m, f) for m, f, _ in got if m == 2] == [(2, 0)]


def test_extract_media_features_decodes_avi_for_real(spark):
    from realtimechurnpredictiondataengineering_spark.operators import multimodal

    media = _rows(spark, "avi_frames.parquet")
    feats = {r["media_id"]: r for r in multimodal.extract_media_features(media).collect()}
    stats = {
        (r["media_id"], r["frame_no"]): r
        for r in multimodal.avi_frame_stats(media).collect()
    }
    checked = 0
    for (mid, fno), s in stats.items():
        if fno != 0 or s["n_px"] is None:
            continue
        f = feats[mid]
        assert (f["width"], f["height"]) == (s["width"], abs(s["height"]))
        # float32 feature storage: the m10 feature test's tolerance
        assert abs(f["feature"][0] * 255.0 - s["mean_r"]) < 1e-3
        assert abs(f["feature"][1] * 255.0 - s["mean_g"]) < 1e-3
        assert abs(f["feature"][2] * 255.0 - s["mean_b"]) < 1e-3
        assert abs(f["feature"][3] * 255.0 - s["mean_luma"]) < 1e-3
        checked += 1
    assert checked >= 20
    # the all-compressed row (edge+3) keeps the documented fake
    comp = feats[9900 + 36 + 3]
    from realtimechurnpredictiondataengineering_spark.operators.multimodal import _fake_decode
    payload = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}[9900 + 36 + 3]
    fw, fh, ff = _fake_decode(payload)
    assert (comp["width"], comp["height"]) == (fw, fh)


def test_ll16_registry_entry_ingests_kernel_only_members(spark):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    ll15 = {r["doc_id"]: r for r in REGISTRY["ll15_warc_ingest"][0](spark, FIX).collect()}
    ll16 = {r["doc_id"]: r for r in REGISTRY["ll16_warc_ingest_kernel"][0](spark, FIX).collect()}
    assert set(ll15) < set(ll16)  # strictly more: compressed members ingest
    for doc_id, e in ll15.items():
        k = ll16[doc_id]
        for f in ("target_uri", "http_status", "content_type", "rec_bytes",
                  "n_tokens", "quality", "fingerprint"):
            assert e[f] == k[f], (doc_id, f)
    # canonicalization is computed over the WIDER corpus: every
    # fingerprint still has exactly one canonical row
    by_fp = {}
    for r in ll16.values():
        by_fp.setdefault(r["fingerprint"], []).append(r)
    for grp in by_fp.values():
        assert sum(1 for r in grp if r["is_canonical"]) == 1


# --- URL / domain family (operators/urls.py) --------------------------------


def _parsed(spark, rows):
    from realtimechurnpredictiondataengineering_spark.operators import urls

    df = spark.createDataFrame(rows, "doc_id long, url string")
    return urls.url_components(df)


def test_url_components_edges(spark):
    rows = [
        (1, "https://WWW.Site4.CO.UK:8080/p/3?b=2&a=1#frag"),
        (2, "http://example.org"),            # no port/path/query/fragment
        (3, "HTTP://HOST.COM/"),              # scheme+host case-fold
        (4, "https://h.io/p#only-frag"),
        (5, "https://h.io/p?"),               # empty query
        (6, "not a url at all"),
    ]
    got = {r["doc_id"]: r for r in _parsed(spark, rows).collect()}
    r = got[1]
    assert (r["scheme"], r["host"], r["port"]) == ("https", "www.site4.co.uk", 8080)
    assert (r["path"], r["query"], r["fragment"]) == ("/p/3", "b=2&a=1", "frag")
    r = got[2]
    assert (r["scheme"], r["host"]) == ("http", "example.org")
    assert r["port"] is None and r["path"] is None and r["query"] is None
    assert got[3]["scheme"] == "http" and got[3]["host"] == "host.com"
    assert got[3]["path"] == "/"
    assert got[4]["fragment"] == "only-frag" and got[4]["query"] is None
    # '?#'-style empty query parses as NULL (nullif contract)
    assert got[5]["query"] is None
    r = got[6]
    assert all(r[c] is None for c in ("scheme", "host", "port", "path", "fragment"))


def test_registered_domain_psl(spark):
    from realtimechurnpredictiondataengineering_spark.operators import urls

    rows = [
        (1, "www.site4.co.uk"),
        (2, "site4.com"),
        (3, "a.b.site9.com.au"),
        (4, "localhost"),       # single label: no registrable domain (PSL)
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    got = {r["doc_id"]: r for r in urls.registered_domain(df, spark).collect()}
    assert (got[1]["registered_domain"], got[1]["public_suffix"]) == (
        "site4.co.uk", "co.uk")
    assert (got[2]["registered_domain"], got[2]["public_suffix"]) == (
        "site4.com", "com")
    # deep subdomain: registrable = last THREE labels under a 2-label suffix
    assert (got[3]["registered_domain"], got[3]["public_suffix"]) == (
        "site9.com.au", "com.au")
    assert got[4]["registered_domain"] is None
    assert got[4]["public_suffix"] == "localhost"
    assert got[5]["registered_domain"] is None and got[5]["public_suffix"] is None


def test_normalized_url_rules(spark):
    from realtimechurnpredictiondataengineering_spark.operators import urls

    rows = [
        (1, "https://A.IO:443/x?utm_source=a&b=2&a=1#f"),  # default port + utm + sort
        (2, "http://a.io:80/x"),                           # http default port
        (3, "http://a.io:8080/x"),                         # NON-default kept
        (4, "https://a.io"),                               # empty path -> '/'
        (5, "https://a.io/x?utm_a=1&utm_b=2"),             # all params dropped
    ]
    p = _parsed(spark, rows)
    got = {
        r["doc_id"]: r["n"]
        for r in p.withColumn("n", urls.normalized_url(p)).collect()
    }
    assert got[1] == "https://a.io/x?a=1&b=2"
    assert got[2] == "http://a.io/x"
    assert got[3] == "http://a.io:8080/x"
    assert got[4] == "https://a.io/"
    assert got[5] == "https://a.io/x"


def test_blocklist_ladder_depth_and_exact_entries(spark):
    from realtimechurnpredictiondataengineering_spark.operators import urls

    rows = [
        (1, "deep.sub.site7.com"),    # suffix entry hits at rung 3
        (2, "site7.com"),             # suffix entry hits itself
        (3, "www.site21.com.au"),     # exact-host entry
        (4, "site21.com.au"),         # parent of an exact entry: NOT blocked
        (5, "SITE7.COM"),             # case-folded before probing
        (6, "site7.com.evil.net"),    # suffix must anchor at the END
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    got = {(r["doc_id"], r["category"]) for r in urls.blocked_docs(df, spark).collect()}
    assert got == {(1, "ads"), (2, "ads"), (3, "tracking"), (5, "ads")}


def test_cc03_plans_window_group_limit_and_broadcasts(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    plan = (
        REGISTRY["cc03_domain_caps"][0](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank<=K filter must plan the map-side partial top-K
    assert "WindowGroupLimit" in plan, plan[:2000]
    for name in ("cc02_registered_domain", "cc04_url_blocklist"):
        plan = (
            REGISTRY[name][0](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, (name, plan[:2000])
        assert "SortMergeJoin" not in plan, (name, plan[:2000])


def test_ll17_streaming_equals_ll16_batch_canonical_set(spark):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    batch = REGISTRY["ll16_warc_ingest_kernel"][0](spark, FIX)
    want = {
        (r["fingerprint"], r["n_tokens"], r["quality"])
        for r in batch.collect()
        if r["is_canonical"]
    }
    got = {
        tuple(r)
        for r in REGISTRY["ll17_streaming_warc_ingest"][0](spark, FIX)
        .select("fingerprint", "n_tokens", "quality")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_html_to_text_contract_cross_engine(spark):
    # the extraction ORDER is the contract: blocks before tags, tags
    # before entities, &amp; last — pinned against DuckDB on hostile
    # cases (script bodies with '<'/quotes, double-encoded entities,
    # unterminated tags, full-comment pages)
    import duckdb

    cases = [
        '<html><head><style>p{a<1}</style><script>if(x<2){y("q")}</script>'
        '</head><body><!-- c --><nav>Home &amp; Help</nav><p>hi  there</p>'
        '<p>&quot;q&quot; &lt;tag&gt; &#39;s&#39;&nbsp;end</p></body></html>',
        '<p>multi\nline\ttext</p>',
        'no tags at all',
        '<SCRIPT>UPPER()</SCRIPT>ok<STYLE>x</STYLE>',
        '<a href="x.html" class="b">link text</a> tail',
        '&amp;lt; double-encoded',  # one decode pass: stays '&lt;'
        '',
        None,
        '<p>unterminated <b>bold',
        '<!-- <p>commented out</p> -->visible',
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", tx.html_to_text("h").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.execute(
            f"SELECT {tx.sql_html_to_text('?')}", [c]
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
    assert got[0] == 'Home & Help hi there "q" <tag> \'s\' end'
    assert got[3] == "ok"
    assert got[5] == "&lt; double-encoded"
    assert got[7] is None


def test_ll19_extracts_html_and_passes_plain_verbatim(spark):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["ll19_html_ingest"][0](spark, FIX).collect()
    }
    edge = 9800 + 32
    base = warc._DOC_ID_BASE
    # real-markup page: boilerplate text survives, markup/script gone
    p1 = rows[(edge + 15) * base]
    assert p1["content_type"] == "text/html"
    assert "première page — café" in p1["text_clean"]
    assert "Home | Archive & Help" in p1["text_clean"]
    assert "<" not in p1["text_clean"].replace("&lt;", "")
    assert "go(" not in p1["text_clean"] and "margin" not in p1["text_clean"]
    # charset parameter still routes through extraction
    p3 = rows[(edge + 17) * base]
    assert "emoji \U0001f600 page" in p3["text_clean"]
    # text/plain member in the mixed shard passes through VERBATIM
    plain = rows[(edge + 16) * base + 1]
    assert plain["content_type"] == "text/plain"
    assert plain["text_clean"] == "plain <not-a-tag> body &amp; untouched"


def test_t37_links_and_cc07_graph_policies(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    links = REGISTRY["t37_link_extraction"][0](spark, sf_dir)
    per_doc = links.groupBy("doc_id").count().collect()
    # 2 absolute + 1 relative, plus the archive-hub link on every 3rd doc
    assert all(r["count"] == (4 if r["doc_id"] % 3 == 0 else 3) for r in per_doc)
    one = {r["href"]: r["anchor"] for r in links.filter(F.col("doc_id") == 0).collect()}
    rel = [h for h in one if h.startswith("/rel/")]
    assert len(rel) == 1  # extractor KEEPS relative hrefs
    # anchor cleanup: nested tag stripped, entity decoded
    assert "second & bold link" in one.values()
    graph = REGISTRY["cc07_link_graph"][0](spark, sf_dir)
    g = graph.collect()
    assert all(r["dst_domain"] is not None for r in g)  # relative dropped
    # plan: both suffix probes broadcast, no sort-merge join
    plan = graph._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_cc08_pagerank_mass_hub_and_dangling(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    pr = {
        r["domain"]: r["pagerank"]
        for r in REGISTRY["cc08_domain_pagerank"][0](spark, sf_dir).collect()
    }
    # mass conserved (up to the 1e-8 output rounding per node)
    assert abs(sum(pr.values()) - 1.0) < 1e-5
    # the archive hub is DANGLING (in-links only) and must dominate:
    # every third page links it, nothing links back out
    hub = pr.pop("archive.example")
    assert hub > 5 * max(pr.values())
    # every rank positive (the (1-d)/N floor)
    assert min(pr.values()) > 0


def test_t38_anchor_topk_semantics(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    rows = REGISTRY["t38_anchor_text_topk"][0](spark, sf_dir).collect()
    assert rows and all(1 <= r["rk"] <= 3 and r["n_refs"] >= 1 for r in rows)
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["dst_domain"], []).append(r)
    # per-domain ranks dense from 1 and ordered by (n_refs desc, anchor)
    for dom, rs in by_dom.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["n_refs"], r["anchor"]) for r in rs]
        assert keys == sorted(keys)
    # the hub's only anchor text is the cleaned "archive"
    assert [r["anchor"] for r in by_dom["archive.example"]] == ["archive"]
    # anchor cleanup flowed through: nested tag stripped, entity decoded
    assert any(r["anchor"] == "second & bold link" for r in rows)


def test_cc10_hits_normalization_and_hub_split(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    rows = REGISTRY["cc10_hits"][0](spark, sf_dir).collect()
    auth = {r["domain"]: r["authority"] for r in rows}
    hub = {r["domain"]: r["hub"] for r in rows}
    # L1-normalized each half-step (up to the 1e-8 output rounding)
    assert abs(sum(auth.values()) - 1.0) < 1e-5
    assert abs(sum(hub.values()) - 1.0) < 1e-5
    assert min(auth.values()) >= 0 and min(hub.values()) >= 0
    # archive.example is a pure AUTHORITY: heavily linked, never links out
    assert auth["archive.example"] == max(auth.values())
    assert hub["archive.example"] == 0.0
    # and the linking site domains are the hubs
    assert max(hub.values()) > 0


def test_cc09_frontier_gates_and_cap(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    fr = REGISTRY["cc09_crawl_frontier"][0](spark, sf_dir)
    rows = fr.collect()
    urls = {r["url"] for r in rows}
    # gate 1: nothing already crawled survives
    crawled = {
        r["norm_url"]
        for r in REGISTRY["cc05_url_normalize"][0](spark, sf_dir).collect()
    }
    assert not urls & crawled
    # gate 2: the blocklisted spam neighborhood is gone
    assert all("site999.example" not in r["dst_domain"] for r in rows)
    # gate 5: per-domain politeness cap binds on the fresh domains
    # (5 candidate paths each, cap 3) and ranks are dense from 1
    by_dom: dict = {}
    for r in rows:
        by_dom.setdefault(r["dst_domain"], []).append(r)
    for j in range(8):
        rs = by_dom[f"fresh{j}.example"]
        assert sorted(r["rk"] for r in rs) == [1, 2, 3]
        # unranked NEW domains schedule at the 0.0 floor
        assert all(r["pagerank"] == 0.0 for r in rs)
    # the ranked hub outranks every fresh domain
    assert by_dom["archive.example"][0]["pagerank"] > 0
    # plan: the politeness cap prunes map-side, blocklist join broadcasts
    plan = fr._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
