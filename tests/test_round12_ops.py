"""Round-12 operator tests: both-directional BPE eow guards with
suffix-structural marker detection, plus the round's new operators."""

import pytest


# --- BPE eow guard, mirror direction + tightened detection ------------------


def test_bpe_eow_true_on_markerless_artifacts_fails_loudly(spark):
    # serving a marker-free (eow=False-trained) table/vocab/list with
    # end_of_word=True used to silently surface stray marker or
    # single-char tokens; now it raises on all three serve paths
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_frame,
        bpe_segment_vocab,
    )

    merges = spark.createDataFrame(
        [(1, "o", "k")], "merge_rank int, left_sym string, right_sym string"
    )
    vocab = spark.createDataFrame(
        [("ok", 3), ("o", 4), ("k", 4)], "symbol string, n_occurrences long"
    )
    df = spark.createDataFrame([(1, "ok")], ["doc_id", "text"])
    with pytest.raises(Exception, match="end_of_word"):
        bpe_segment_frame(df, merges, end_of_word=True).collect()
    with pytest.raises(Exception, match="end_of_word"):
        bpe_segment_vocab(df, vocab, end_of_word=True).collect()
    with pytest.raises(ValueError, match="end_of_word"):
        bpe_segment(df, [("o", "k")], end_of_word=True)


def test_bpe_eow_true_empty_artifacts_exempt(spark):
    # zero-merge eow segmentation is well defined (char split + marker):
    # the mirror guard must not fire on an EMPTY merge table
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_frame,
    )

    empty = spark.createDataFrame(
        [], "merge_rank int, left_sym string, right_sym string"
    )
    df = spark.createDataFrame([(1, "ok")], ["doc_id", "text"])
    got = bpe_segment_frame(df, empty, end_of_word=True).collect()[0]
    assert got["bpe_text"] == "o k </w>"
    assert got["n_bpe_tokens"] == 3


def test_bpe_eow_detection_is_suffix_structural_not_containment(spark):
    # a table legitimately trained with end_of_word=False on a corpus
    # containing '<'/'>' words can learn symbols CONTAINING the literal
    # marker; only a right-operand marker SUFFIX signals eow training,
    # so an eow=False serve of such a table must NOT raise
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_frame,
        bpe_segment_vocab,
    )

    # marker appears mid-left-symbol and mid-right-symbol — neither is a
    # right-operand suffix, so this is a valid eow=False artifact
    merges = spark.createDataFrame(
        [(1, "x</w>", "y"), (2, "a", "</w>b")],
        "merge_rank int, left_sym string, right_sym string",
    )
    df = spark.createDataFrame([(1, "xy")], ["doc_id", "text"])
    got = bpe_segment_frame(df, merges).collect()[0]
    assert got["bpe_text"] == "x y"  # chars: no merge applies, no raise
    out = bpe_segment(df, [("x</w>", "y"), ("a", "</w>b")]).collect()[0][
        "bpe_tokens"
    ]
    assert out == ["x", "y"]
    vocab = spark.createDataFrame(
        [("</w>x", 2), ("x", 3), ("y", 3)], "symbol string, n_occurrences long"
    )
    got_v = bpe_segment_vocab(df, vocab).collect()[0]
    assert got_v["bpe_text"] == "x y"


# --- IVF-PQ under a trained centroid frame (v25) -----------------------------


def test_ivf_pq_topk_frame_matches_literal_variant(spark):
    # fed the SAME coarse centroids and codebooks, the frame-based
    # IVF-PQ must reproduce the literal-based one row for row (binning,
    # residual encoding, probe order, ADC scoring)
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_pq_topk_frame,
        train_ivf_pq,
    )

    vecs = spark.createDataFrame(
        [
            (i, [1.0 * ((i * 3) % 5), 0.5 * ((i + 2) % 4), 0.25 * (i % 3), 0.1 * i])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    sample = [r["embedding"] for r in vecs.collect()]
    cents, books = train_ivf_pq(sample, nlist=4, m=2, ksub=4)
    qs = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    lit = sorted(
        map(tuple, ivf_pq_topk(vecs, qs, cents, books, k=4, nprobe=2).collect())
    )
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, centroid array<double>"
    )
    framed = sorted(
        map(tuple, ivf_pq_topk_frame(vecs, qs, cdf, books, k=4, nprobe=2).collect())
    )
    assert framed == lit and len(framed) == 8


# --- GIF/BMP header decode (m05) ---------------------------------------------


def test_media_header_dims_decodes_gif_and_bmp(spark):
    # fixed-offset legacy formats through the shared dispatch: GIF LE
    # u16 dims, BMP signed LE i32 dims (negative = top-down, surfaced
    # as-is), COREHEADER out of contract, truncation → NULL dims
    from tools.gen_media_fixture import bmp_bytes, gif_bytes, png_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        media_header_dims,
    )

    rows = [
        (1, gif_bytes(640, 480, v89=True, pad=3)),
        (2, gif_bytes(13, 7, v89=False, pad=0)),
        (3, bmp_bytes(1920, 1080)),
        (4, bmp_bytes(640, -480)),            # top-down
        (5, bmp_bytes(33, 22, dib_size=108)),  # BITMAPV4
        (6, b"GIF89a"),                        # magic only
        (7, b"BM"),                            # header only
        (8, bmp_bytes(100, 50)[:20]),          # cut mid-width
        (9, png_bytes(10, 20, pad=4)),         # dispatch still works
        (10, b"nope"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["fmt"], r["width"], r["height"])
        for r in media_header_dims(df).collect()
    }
    assert got[1] == ("gif", 640, 480)
    assert got[2] == ("gif", 13, 7)
    assert got[3] == ("bmp", 1920, 1080)
    assert got[4] == ("bmp", 640, -480)
    assert got[5] == ("bmp", 33, 22)
    assert got[6] == ("gif", None, None)
    assert got[7] == ("bmp", None, None)
    # cut mid-width: the DIB size field (40) is fully readable, width's
    # missing high bytes zero-pad — 100 survives, height reads NULL
    assert got[8] == ("bmp", 100, None)
    assert got[9] == ("png", 10, 20)
    assert got[10] == ("unknown", None, None)


def test_gif_bmp_roundtrip_random_dims(spark):
    # property-style sweep: encode → header-decode recovers the exact
    # dims across the u16 range (GIF) and signed i32 edges (BMP)
    from tools.gen_media_fixture import bmp_bytes, gif_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        media_header_dims,
    )

    cases = []
    mid = 0
    for w, h in [(1, 1), (65535, 65535), (256, 255), (300, 4097)]:
        cases.append((mid, gif_bytes(w, h, v89=mid % 2 == 0, pad=mid), "gif", w, h))
        mid += 1
    for w, h in [(1, 1), (2**31 - 1, 1), (1, -(2**31)), (1234567, -7654321)]:
        for dib in (40, 108, 124):
            cases.append((mid, bmp_bytes(w, h, dib_size=dib), "bmp", w, h))
            mid += 1
    df = spark.createDataFrame(
        [(m, p) for m, p, _, _, _ in cases], "media_id long, payload binary"
    )
    got = {
        r["media_id"]: (r["fmt"], r["width"], r["height"])
        for r in media_header_dims(df).collect()
    }
    for m, _, fmt, w, h in cases:
        assert got[m] == (fmt, w, h), (m, got[m])


def test_ivf_pq_rescore_frame_matches_literal_variant(spark):
    # the index+refine stack under a trained frame: same centroids and
    # codebooks → identical rows to the literal rescore variant
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        ivf_pq_rescore_topk,
        ivf_pq_rescore_topk_frame,
        train_ivf_pq,
    )

    vecs = spark.createDataFrame(
        [
            (i, [1.0 * ((i * 3) % 5), 0.5 * ((i + 2) % 4), 0.25 * (i % 3), 0.1 * i])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    sample = [r["embedding"] for r in vecs.collect()]
    cents, books = train_ivf_pq(sample, nlist=4, m=2, ksub=4)
    qs = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    lit = sorted(
        map(
            tuple,
            ivf_pq_rescore_topk(
                vecs, qs, cents, books, k=3, nprobe=2, rescore_factor=3
            ).collect(),
        )
    )
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, centroid array<double>"
    )
    framed = sorted(
        map(
            tuple,
            ivf_pq_rescore_topk_frame(
                vecs, qs, cdf, books, k=3, nprobe=2, rescore_factor=3
            ).collect(),
        )
    )
    assert framed == lit and len(framed) == 6


# --- MP3 header decode (m06) --------------------------------------------------


def test_mp3_header_meta_values(spark):
    from tools.gen_media_fixture import mp3_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        mp3_header_meta,
    )

    rows = [
        (1, mp3_bytes(5, 0, 3)),                      # 64 kbps, 44100, 3 frames
        (2, mp3_bytes(14, 1, 2, id3_pad=40, decoy=True)),  # decoys inside ID3
        (3, mp3_bytes(1, 2, 4, pad_alternates=True, mode=3)),  # mono, varying pad
        (4, mp3_bytes(5, 0, 30)),                     # walk budget exceeded
        (5, mp3_bytes(5, 0, 24)),                     # exactly at budget
        (6, mp3_bytes(3, 0, 2, tag_v1=True)),         # trailing ID3v1 'TAG'
        (7, bytes([0xFF, 0xF3, 0x52, 0]) + bytes(50)),  # MPEG-2: fields NULL
        (8, b"not-audio"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in mp3_header_meta(df).collect()}

    assert (got[1]["fmt"], got[1]["bitrate_kbps"], got[1]["sample_rate"]) == (
        "mp3", 64, 44100,
    )
    assert got[1]["n_frames"] == 3
    assert got[1]["duration_ms"] == 3 * 1152000 // 44100
    # the size-based ID3 skip never reads the planted 0xFF sync bytes
    assert (got[2]["bitrate_kbps"], got[2]["sample_rate"], got[2]["n_frames"]) == (
        320, 48000, 2,
    )
    assert (got[3]["n_channels"], got[3]["n_frames"]) == (1, 4)
    # mid-chain at the budget → count unknown; CBR estimate still real
    assert got[4]["n_frames"] is None and got[4]["duration_ms"] is None
    assert got[4]["est_duration_ms"] is not None
    # chain consuming the payload EXACTLY at the budget is a clean end
    assert got[5]["n_frames"] == 24
    assert got[6]["n_frames"] == 2  # walk stops cleanly on the TAG block
    assert got[7]["fmt"] == "mp3" and got[7]["bitrate_kbps"] is None
    assert got[8]["fmt"] == "unknown" and got[8]["n_frames"] is None


# --- MP4 header decode (m07) --------------------------------------------------


def test_mp4_header_meta_values(spark):
    import struct

    from tools.gen_media_fixture import _box, mp4_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        mp4_header_meta,
    )

    rows = [
        (1, mp4_bytes(600, 1200, n_traks=2)),
        (2, mp4_bytes(90000, 123456, n_traks=3, v1=True, pre_boxes=2)),
        (3, mp4_bytes(1000, 5000, decoy=True, extended_mdat=True)),
        (4, mp4_bytes(1000, 5000, mdat_last_size0=True, brand=b"qt  ")),
        (5, b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"),  # ftyp only
        (6, mp4_bytes(600, 1200)[:30]),                    # cut mid-moov hunt
        (7, mp4_bytes(600, 1200)[: 24 + 8 + 8 + 10]),      # cut mid-mvhd fields
        (8,
         _box(b"ftyp", b"isom" + struct.pack(">I", 0))
         + b"".join(_box(b"free", b"xx") for _ in range(20))
         + mp4_bytes(600, 1200)[24:]),                     # budget exhausted
        (9, b"definitely-not-a-video"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in mp4_header_meta(df).collect()}
    assert (got[1]["fmt"], got[1]["major_brand"], got[1]["timescale"]) == (
        "mp4", "isom", 600,
    )
    assert (got[1]["duration_ms"], got[1]["n_tracks"]) == (2000, 2)
    # mvhd VERSION 1 packs u64 times — different field offsets
    assert (got[2]["timescale"], got[2]["duration_ms"], got[2]["n_tracks"]) == (
        90000, 123456 * 1000 // 90000, 3,
    )
    # planted 'moov'/'mvhd' inside an EXTENDED-size mdat: box-aligned
    # jumps (incl. the 64-bit size read) never see the decoy
    assert (got[3]["timescale"], got[3]["duration_ms"]) == (1000, 5000)
    assert (got[4]["major_brand"], got[4]["duration_ms"]) == ("qt  ", 5000)
    assert got[5]["fmt"] == "mp4" and got[5]["timescale"] is None
    assert got[6]["timescale"] is None
    assert got[7]["timescale"] is None and got[7]["n_tracks"] == 0
    assert got[8]["fmt"] == "mp4" and got[8]["n_tracks"] is None  # budget
    assert got[9]["fmt"] == "unknown" and got[9]["major_brand"] is None


# --- d16: CCNet/RefinedWeb line-level dedup ---------------------------------


def test_remove_duplicated_lines_edges(spark):
    # the committed fixture's pinned edge rows, checked by SEMANTICS
    # rather than by the oracle's value hash: all-boilerplate doc
    # empties out and fails the doc gate; within-doc repeats survive
    # (distinct-doc count is 1); a line shared by exactly two docs is
    # removed from both; trim normalization catches padded boilerplate;
    # case variants are different lines; blank/empty docs survive the
    # left join with zero lines
    from realtimechurnpredictiondataengineering_spark.operators.corpus import (
        remove_duplicated_lines,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import (
        _multiline_fixture_path,
    )

    docs = spark.read.parquet(_multiline_fixture_path().replace("''", "'"))
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_lines(docs).collect()
        if r["doc_id"] >= 220
    }
    assert got[220]["clean_text"] == "" and got[220]["doc_kept"] is False
    assert got[221]["n_lines"] == 0 and got[221]["doc_kept"] is True
    assert got[222]["n_lines"] == 0 and got[222]["clean_text"] == ""
    # within-doc repeat: both copies kept, original order preserved
    assert got[223]["n_kept_lines"] == 3
    assert got[223]["clean_text"].split("\n")[0] == got[223]["clean_text"].split("\n")[2]
    # cross-doc shared line removed from BOTH docs
    assert got[224]["n_kept_lines"] == 1 and got[225]["n_kept_lines"] == 1
    assert "oddly specific" not in got[224]["clean_text"]
    assert got[226]["n_kept_lines"] == 1 and got[226]["doc_kept"] is True
    # padded boilerplate trims onto the corpus-wide line and is removed
    assert got[227]["n_kept_lines"] == 1
    assert "newsletter" not in got[227]["clean_text"]
    # case variant is a different exact line: kept
    assert got[228]["n_kept_lines"] == 2
    assert got[229]["removed_line_frac"] == 0.75 and got[229]["doc_kept"] is False


def test_remove_duplicated_lines_max_docs_valve(spark):
    # raising max_docs keeps lines up to that prevalence: the two-doc
    # shared line survives at max_docs=2 while 20+-doc boilerplate
    # still dies
    from realtimechurnpredictiondataengineering_spark.operators.corpus import (
        remove_duplicated_lines,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import (
        _multiline_fixture_path,
    )

    docs = spark.read.parquet(_multiline_fixture_path().replace("''", "'"))
    got = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_lines(docs, max_docs=2).collect()
        if r["doc_id"] in (224, 220)
    }
    assert got[224]["n_kept_lines"] == 2  # the two-doc line now survives
    assert got[220]["n_kept_lines"] == 0  # boilerplate is way past 2 docs


# --- m08: TIFF endian-dispatched IFD decode ---------------------------------


def test_tiff_header_meta_values(spark):
    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        tiff_header_meta,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import (
        _tiff_fixture_path,
    )

    media = spark.read.parquet(_tiff_fixture_path().replace("''", "'"))
    got = {
        r["media_id"]: r.asDict()
        for r in tiff_header_meta(media).collect()
        if r["media_id"] >= 7048
    }
    # 40-entry IFD: dims sit past the 32-entry budget -> NULL (unknown),
    # the declared count still reports
    assert got[7048]["width"] is None and got[7048]["n_ifd_entries"] == 40
    # malformed ASCII-typed width entry first: the well-typed one wins
    assert (got[7049]["width"], got[7049]["height"]) == (123, 45)
    # BitsPerSample count=3: the value field is an OFFSET -> NULL by contract
    assert got[7050]["width"] == 222 and got[7050]["bits_per_sample"] is None
    assert got[7051]["fmt"] == "unknown"  # BigTIFF magic 43
    # magic-only: fmt/byte_order decode, everything behind the missing
    # IFD pointer is NULL
    assert (got[7052]["fmt"], got[7052]["byte_order"]) == ("tiff", "II")
    assert got[7052]["n_ifd_entries"] is None
    # cut ONE byte into the LE count field: the low byte alone reads 3
    # (missing high bytes zero-pad, the family's partial-read contract),
    # but every entry behind it is gone -> NULL dims
    assert got[7053]["n_ifd_entries"] == 3 and got[7053]["width"] is None
    # LONG height value cut to its 2 low bytes: LE keeps them (0x00030002
    # -> 2), width before the cut is intact
    assert (got[7054]["width"], got[7054]["height"]) == (640, 2)
    assert got[7055]["n_ifd_entries"] is None  # IFD offset past EOF
    assert got[7056]["fmt"] == "unknown"       # 'II*' decoy not at offset 0
    assert (got[7057]["fmt"], got[7057]["byte_order"]) == ("tiff", "MM")
    assert got[7058]["fmt"] == "unknown"       # PNG dispatch check


# --- m09: gzip member-header decode ------------------------------------------


def test_gzip_header_meta_values(spark):
    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        gzip_header_meta,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import (
        _gzip_fixture_path,
    )

    media = spark.read.parquet(_gzip_fixture_path().replace("''", "'"))
    got = {
        r["media_id"]: r.asDict()
        for r in gzip_header_meta(media).collect()
    }
    # FEXTRA before FNAME: the name start shifts past the extra field
    assert got[8002]["filename"] == "shard-002.warc"
    assert got[8002]["mtime"] == 2 * 86400
    # concatenated members: header fields are the FIRST member's, the
    # trailer ISIZE read is the LAST member's (real gzip semantics)
    assert got[8040]["filename"] == "a.txt"
    assert got[8040]["isize"] == len("second-member") * 9
    # FNAME terminator past the 64-byte scan budget -> unknown
    assert got[8041]["filename"] is None and got[8041]["isize"] == 1
    # zero-length FNAME is an EMPTY string, not NULL
    assert got[8042]["filename"] == "" and got[8042]["isize"] == 30
    assert got[8043]["fmt"] == "unknown"  # CM != 8 is not a deflate member
    # header-only: too short for any trailer
    assert got[8044]["fmt"] == "gzip" and got[8044]["isize"] is None
    # cut two bytes into the LE mtime: low bytes survive (0x01020304 -> 0x0304)
    assert got[8045]["mtime"] == 0x0304 and got[8045]["os_code"] is None
    # magic+CM only: no flag byte -> every flag-derived field unknown
    assert got[8046]["fmt"] == "gzip" and got[8046]["is_text"] is None
    assert got[8047]["fmt"] == "unknown"  # in-payload magic decoy


# --- v27: fully cluster-trained IVF-PQ ---------------------------------------


def test_ivf_pq_frame_codebooks_match_literal_path(spark):
    # the codebook-FRAME serve mode must be bit-identical to the
    # literal mode on the SAME codebook content: both paths share one
    # encode/LUT expression, this pins the frame collapse itself
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        ivf_pq_topk_frame,
        kmeans_centroids,
        train_pq_codebooks,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import _te

    from pyspark.sql import functions as F

    e = _te(spark, "/root/testdata/sf0.001")
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    cents = kmeans_centroids(ed, k=4, rounds=2)
    books = train_pq_codebooks(
        [r["embedding"] for r in ed.limit(64).collect()], m=8, ksub=4
    )
    bframe = spark.createDataFrame(
        [(j, c, cent) for j, book in enumerate(books) for c, cent in enumerate(book)],
        "j int, c int, codebook array<double>",
    )
    qs = ed.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    lit_rows = sorted(
        tuple(r) for r in ivf_pq_topk_frame(ed, qs, cents, books, k=5, nprobe=2).collect()
    )
    frame_rows = sorted(
        tuple(r)
        for r in ivf_pq_topk_frame(
            ed, qs, cents, bframe, k=5, nprobe=2, dsub=8
        ).collect()
    )
    assert lit_rows == frame_rows and len(lit_rows) > 0


def test_pq_codebooks_frame_matches_per_slice_kmeans(spark):
    # the partitioned loop (subspace as a grouping key) must train the
    # SAME codebook per subspace as the trusted single k-means run on
    # that subspace's slice frame — same init rule, grids, tie-breaks
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        kmeans_centroids,
        pq_codebooks_frame,
    )
    from realtimechurnpredictiondataengineering_spark.plans.inventory import _te

    from pyspark.sql import functions as F

    e = _te(spark, "/root/testdata/sf0.001")
    ed = e.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    got = {
        (r["j"], r["c"]): r["codebook"]
        for r in pq_codebooks_frame(
            ed, m=4, ksub=3, rounds=2, vec_col="vec", dims=64
        ).collect()
    }
    assert len(got) == 4 * 3
    for j in (0, 3):
        sliced = ed.select(
            "vec_id", F.slice("vec", j * 16 + 1, 16).alias("sv")
        )
        ref = {
            r["cluster"]: r["centroid"]
            for r in kmeans_centroids(
                sliced, k=3, rounds=2, vec_col="sv"
            ).collect()
        }
        for c in range(3):
            assert got[(j, c)] == ref[c], (j, c)
