"""Round-13 operators: BMP pixel stats (m10), WAV PCM stats (m11),
WARC segmentation (m12 + the zlib kernel), the bounded header-prefix
contract, and the gzip FNAME ASCII gate."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import multimodal, warc

FIX = "fixtures"


def _rows(spark, path):
    return spark.read.parquet(f"{FIX}/{path}")


def test_bmp_pixel_stats_match_python_ground_truth(spark):
    out = {
        r["media_id"]: r
        for r in multimodal.bmp_pixel_stats(_rows(spark, "bmp_pixels.parquet")).collect()
    }
    import pyarrow.parquet as pq

    checked_stats = 0
    for rec in pq.read_table(f"{FIX}/bmp_pixels.parquet").to_pylist():
        b, mid = rec["payload"], rec["media_id"]
        row = out[mid]
        if len(b) < 34 or b[:2] != b"BM":
            assert row["n_px"] is None and row["mean_r"] is None
            continue
        data_off, = struct.unpack_from("<I", b, 10)
        dib, = struct.unpack_from("<I", b, 14)
        w, hgt = struct.unpack_from("<ii", b, 18)
        bpp, = struct.unpack_from("<H", b, 28)
        comp, = struct.unpack_from("<I", b, 30)
        absh, stride = abs(hgt), (3 * w + 3) // 4 * 4
        ok = (
            dib in (40, 108, 124) and bpp == 24 and comp == 0
            and 0 < w <= 4096 and 0 < absh <= 4096 and w * absh <= 4096
            and data_off + stride * absh <= len(b)
        )
        if not ok:
            assert row["mean_r"] is None, mid
            continue
        sb = sg = sr = 0
        for i in range(w * absh):
            r_, c = divmod(i, w)
            o = data_off + r_ * stride + c * 3
            sb += b[o]
            sg += b[o + 1]
            sr += b[o + 2]
        npx = w * absh
        assert row["n_px"] == npx
        assert row["mean_r"] == sr / npx and row["mean_g"] == sg / npx
        assert row["mean_b"] == sb / npx
        assert row["mean_luma"] == (0.299 * sr + 0.587 * sg + 0.114 * sb) / npx
        checked_stats += 1
    assert checked_stats >= 30  # the fixture's in-contract majority


def test_wav_pcm_stats_match_python_ground_truth(spark):
    out = {
        r["media_id"]: r
        for r in multimodal.wav_pcm_stats(_rows(spark, "wav_pcm.parquet")).collect()
    }
    import pyarrow.parquet as pq

    checked = 0
    for rec in pq.read_table(f"{FIX}/wav_pcm.parquet").to_pylist():
        b, mid = rec["payload"], rec["media_id"]
        row = out[mid]
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            assert row["rms"] is None
            continue
        p, steps = 12, 0
        code = bits = db = doff = rate = None
        while steps < 16 and p * 2 + 14 <= len(b) * 2:
            if rate is not None and db is not None:
                break
            cid = b[p : p + 4]
            size, = struct.unpack_from("<I", b, p + 4)
            if cid == b"fmt ":
                code, _ch = struct.unpack_from("<HH", b, p + 8)
                rate, = struct.unpack_from("<I", b, p + 12)
                bits, = struct.unpack_from("<H", b, p + 22)
            elif cid == b"data":
                db, doff = size, p + 8
            p += 8 + size + (size % 2)
            steps += 1
        nsamp = db // 2 if db is not None else None
        ok = (
            code == 1 and bits == 16 and doff is not None
            and nsamp and 0 < nsamp <= 4096 and doff + nsamp * 2 <= len(b)
        )
        if not ok:
            assert row["rms"] is None, mid
            continue
        s = q = pk = 0
        for i in range(nsamp):
            v, = struct.unpack_from("<h", b, doff + 2 * i)
            s += v
            q += v * v
            pk = max(pk, abs(v))
        assert row["n_samples"] == nsamp
        assert row["mean_amp"] == s / nsamp
        assert row["rms"] == math.sqrt(q / nsamp)
        assert row["peak_amp"] == pk
        checked += 1
    assert checked >= 30


def test_wav_pcm_peak_covers_both_s16_extremes(spark):
    peaks = (
        multimodal.wav_pcm_stats(_rows(spark, "wav_pcm.parquet"))
        .agg(F.max("peak_amp").alias("mx"))
        .collect()[0]["mx"]
    )
    assert peaks == 32768  # abs(-32768): the fixture pins both extremes


def test_warc_expression_matches_zlib_kernel_on_stored_members(spark):
    media = _rows(spark, "warc_members.parquet")
    expr = {
        (r["media_id"], r["member_no"]): r
        for r in warc.warc_stored_records(media).collect()
    }
    kern = {
        (r["media_id"], r["member_no"]): r
        for r in warc.warc_records(media).collect()
    }
    assert expr, "expression walk found no members"
    # every expression member must exist in the kernel with identical
    # fields (rec_bytes equality holds on single-block stored members)
    for key, e in expr.items():
        k = kern[key]
        for f in (
            "member_off", "fname", "rec_bytes", "isize",
            "warc_version", "warc_type", "target_uri", "content_length",
        ):
            assert e[f] == k[f], (key, f, e[f], k[f])
    # the kernel also decodes the out-of-expression-contract members:
    # the multi-block member (edge row) and the compressed member
    assert len(kern) > len(expr)


def test_warc_kernel_decodes_compressed_and_multiblock_members(spark):
    media = _rows(spark, "warc_members.parquet")
    kern = warc.warc_records(media).collect()
    by_media = {}
    for r in sorted(kern, key=lambda r: (r["media_id"], r["member_no"])):
        by_media.setdefault(r["media_id"], []).append(r)
    edge = 9800 + 32
    # edge row: stored member + multi-block member — kernel sees BOTH
    assert len(by_media[edge]) == 2
    assert by_media[edge][1]["target_uri"] == "https://example.org/big"
    # edge+1: compressed member — kernel parses, expression emits none
    assert len(by_media[edge + 1]) == 1
    expr_media = {
        r["media_id"] for r in warc.warc_stored_records(media).collect()
    }
    assert edge + 1 not in expr_media


def test_warc_binary_content_does_not_poison_header_parse(spark):
    media = _rows(spark, "warc_members.parquet")
    rows = [
        r
        for r in warc.warc_stored_records(media).collect()
        if r["media_id"] == 9800 + 32 + 2
    ]
    assert len(rows) == 1
    assert rows[0]["target_uri"] == "https://example.org/bin"
    assert rows[0]["content_length"] == 8


def test_gzip_non_ascii_fname_surfaces_null(spark):
    out = {
        r["media_id"]: r
        for r in multimodal.gzip_header_meta(_rows(spark, "gzip_headers.parquet")).collect()
    }
    row = out[8000 + 40 + 8]  # the latin-1 'café.txt' edge row
    assert row["fmt"] == "gzip"
    assert row["filename"] is None  # ASCII gate: no U+FFFD substitution


def test_header_prefix_bound_contract(spark):
    # a PNG with 100 KiB of trailing junk decodes fine (header is in
    # the prefix); a JPEG whose SOF hides past 64 KiB reports NULL dims
    # (the documented window contract); gzip ISIZE still reads from the
    # payload SUFFIX beyond the prefix.
    from tools.gen_media_fixture import gzip_member, png_bytes  # conftest puts the repo root on sys.path

    png = png_bytes(321, 123, pad=4) + b"\xAB" * 100_000
    # JPEG: SOI, then one APPn segment of 65533 bytes twice -> SOF past
    # the 64 KiB window
    seg = b"\xff\xe1" + struct.pack(">H", 65533) + b"x" * 65531
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 99, 88) + b"\x03" + b"\x00" * 9
    jpeg = b"\xff\xd8" + seg + seg + sof
    gz = gzip_member(b"payload-bytes" * 9000, fname=b"big.bin")  # > 64 KiB? stored deflate compresses; pad instead
    gz = gz[:-8] + b"\xAC" * 70_000 + gz[-8:]  # force the trailer past the prefix
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg))], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in multimodal.media_header_dims(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (321, 123)
    assert rows[2]["fmt"] == "jpeg" and rows[2]["width"] is None
    gdf = spark.createDataFrame([(3, bytearray(gz))], "media_id long, payload binary")
    grow = multimodal.gzip_header_meta(gdf).collect()[0]
    assert grow["fmt"] == "gzip" and grow["filename"] == "big.bin"
    expected_isize, = struct.unpack("<I", gz[-4:])
    assert grow["isize"] == expected_isize


def test_extract_media_features_decodes_bmp_for_real(spark):
    # the mapInPandas feature kernel now REALLY decodes the codec-free
    # format: in-contract 24bpp BMPs get true dims and channel-mean
    # features that agree with the expression kernel (float32 storage
    # tolerance); everything else keeps the documented fake.
    bmp = _rows(spark, "bmp_pixels.parquet")
    feats = {r["media_id"]: r for r in multimodal.extract_media_features(bmp).collect()}
    stats = {r["media_id"]: r for r in multimodal.bmp_pixel_stats(bmp).collect()}
    checked = 0
    for mid, s in stats.items():
        if s["n_px"] is None:
            continue
        f = feats[mid]
        assert f["width"] == s["width"]
        assert f["height"] == abs(s["height"])
        assert abs(f["feature"][0] * 255.0 - s["mean_r"]) < 1e-3
        assert abs(f["feature"][1] * 255.0 - s["mean_g"]) < 1e-3
        assert abs(f["feature"][2] * 255.0 - s["mean_b"]) < 1e-3
        assert abs(f["feature"][3] * 255.0 - s["mean_luma"]) < 1e-3
        checked += 1
    assert checked >= 30


def test_warc_text_documents_extracts_response_content(spark):
    media = _rows(spark, "warc_members.parquet")
    docs = {r["doc_id"]: r for r in warc.warc_text_documents(media).collect()}
    assert docs, "no documents extracted"
    # the kernel's decompressed records are the ground truth for the
    # stored subset: every expression doc must map back to an ingestible
    # kernel record, and HTTP bodies must be strictly shorter than the
    # record's declared Content-Length (the header block was split off)
    kern = {
        (r["media_id"], r["member_no"]): r for r in warc.warc_records(media).collect()
    }
    for doc_id, d in docs.items():
        mid, mno = divmod(doc_id, warc._DOC_ID_BASE)
        k = kern[(mid, mno)]
        assert k["warc_type"] in ("response", "conversion")
        assert d["target_uri"] == k["target_uri"]
        body_len = len(d["text"].encode("utf-8"))
        if d["http_status"] is not None:  # HTTP-split response
            assert d["http_status"] == 200
            assert body_len < k["content_length"]
        else:  # bare body / WET conversion: content ingests whole
            assert body_len == k["content_length"]
    # real multi-byte UTF-8 flows through the gate (CJK fixture bodies)
    assert any(not d["text"].isascii() for d in docs.values())


def test_ll15_fingerprint_dedup_picks_one_canonical_per_body(spark):
    from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

    rows = REGISTRY["ll15_warc_ingest"][0](spark, "fixtures").collect()
    assert rows
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r)
    # the fixture plants cross-shard duplicate bodies: at least one
    # fingerprint must carry multiple docs, exactly one canonical
    multi = [grp for grp in by_fp.values() if len(grp) > 1]
    assert multi, "fixture duplicates missing"
    for grp in by_fp.values():
        canon = [r for r in grp if r["is_canonical"]]
        assert len(canon) == 1
        assert canon[0]["doc_id"] == min(r["doc_id"] for r in grp)
