"""Property-based tests for the round-9 flagship operators (SURVEY
§5.3 doctrine): each distributed implementation must agree with an
independent sequential model on arbitrary generated inputs.

BPE trainer: the
distributed trainer must agree with an independent sequential textbook
implementation on arbitrary generated corpora — including repeated
characters (overlap greedy-ness), tie-heavy frequency tables
(lexicographic winner determinism), and multi-round merge chaining
where round N's winner contains round N-1's merged symbol.

One hypothesis example = one corpus = one full training run; examples
are kept small (vocab a-c, short words) so the search space is dense in
exactly the adversarial cases: ties, overlaps, and symbols that are
prefixes of each other.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_round9_ops import _sequential_bpe

WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=WORDS)
def test_bpe_train_matches_sequential_on_random_corpora(spark, words):
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    expected = _sequential_bpe(freqs, 4)
    got = [
        (r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    # the distributed trainer may learn FEWER merges only when the
    # sequential one also ran dry (no pairs left)
    assert got == expected


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=WORDS)
def test_bpe_train_eow_matches_sequential_on_random_corpora(spark, words):
    # the end-of-word variant under the same adversarial generator: the
    # marker symbol competes in every pair count and word-final merges
    # chain across rounds (alphabet a-c never collides with the marker,
    # so the '<'/'>' drop guard is a no-op here by construction)
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    expected = _sequential_bpe(freqs, 4, eow=True)
    got = [
        (r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=4, end_of_word=True)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected


# --- media header walks: random container layouts == ground truth ---------


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dims=st.tuples(
        st.integers(min_value=1, max_value=65535),
        st.integers(min_value=1, max_value=65535),
    ),
    n_coms=st.integers(min_value=0, max_value=6),
    com_lens=st.lists(st.integers(min_value=0, max_value=40), min_size=6, max_size=6),
    app1=st.booleans(),
)
def test_jpeg_walk_matches_ground_truth_on_random_layouts(
    spark, dims, n_coms, com_lens, app1
):
    # random APP/COM segment chains in front of SOF0: the byte-aligned
    # walk must recover the planted dimensions wherever SOF lands
    import struct

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        media_header_dims,
    )

    w, h = dims
    parts = [b"\xff\xd8"]
    if app1:
        body = b"Exif\x00\x00ascii-filler"
        parts.append(b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body)
    for i in range(n_coms):
        body = b"c" * com_lens[i]
        parts.append(b"\xff\xfe" + struct.pack(">H", len(body) + 2) + body)
    parts.append(
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    parts.append(b"\xff\xd9")
    df = spark.createDataFrame(
        [(1, b"".join(parts))], "media_id long, payload binary"
    )
    r = media_header_dims(df).collect()[0]
    assert (r["fmt"], r["width"], r["height"]) == ("jpeg", w, h)


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ch=st.integers(min_value=1, max_value=8),
    rate=st.integers(min_value=1, max_value=192000),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_frames=st.integers(min_value=0, max_value=300),
    junk_sizes=st.lists(st.integers(min_value=0, max_value=33), max_size=5),
)
def test_riff_walk_matches_ground_truth_on_random_layouts(
    spark, ch, rate, bits, n_frames, junk_sizes
):
    # random junk chunks (odd sizes exercise the word-align pad) before
    # fmt/data: the little-endian walk must recover the planted fields
    import struct

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        audio_header_meta,
    )

    block = ch * bits // 8
    byte_rate = rate * block
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, rate, byte_rate, block, bits
    )
    payload = b"\xab" * (n_frames * block)
    data = b"data" + struct.pack("<I", len(payload)) + payload
    junk = b""
    for sz in junk_sizes:
        junk += b"JUNK" + struct.pack("<I", sz) + (b"j" * sz) + (b"\x00" if sz % 2 else b"")
    body = b"WAVE" + junk + fmt + data
    df = spark.createDataFrame(
        [(1, b"RIFF" + struct.pack("<I", len(body)) + body)],
        "media_id long, payload binary",
    )
    r = audio_header_meta(df).collect()[0]
    assert (
        r["fmt"],
        r["n_channels"],
        r["sample_rate"],
        r["bits_per_sample"],
        r["data_bytes"],
        r["duration_ms"],
    ) == ("wav", ch, rate, bits, len(payload), len(payload) * 1000 // byte_rate)


# --- streaming MERGE: sequential per-batch == one-shot -------------------

CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),            # key
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.sampled_from(["c", "u", "d"]),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=CHANGES, cuts=st.sets(st.integers(min_value=1, max_value=11), max_size=3))
def test_sequential_merge_equals_one_shot_on_random_logs(spark, changes, cuts):
    # ANY split of a seq-ordered change log into ordered batches must
    # produce the same final state as one one-shot MERGE — the property
    # the streaming foreachBatch loop (c07) rests on
    from realtimechurnpredictiondataengineering_spark.operators import cdc

    target = spark.createDataFrame([(1, 0.0), (3, 0.0)], "id long, val double")
    rows = [(k, v, op, seq) for seq, (k, v, op) in enumerate(changes, start=1)]
    log = spark.createDataFrame(rows, "id long, val double, _op string, seq long")
    one_shot = {
        (r["id"], r["val"])
        for r in cdc.merge_frames(target, log, ["id"], ["seq"]).collect()
    }
    bounds = sorted(c for c in cuts if c < len(rows))
    spans = list(zip([0, *bounds], [*bounds, len(rows)]))
    state = target
    for lo, hi in spans:
        if lo == hi:
            continue
        batch = spark.createDataFrame(
            rows[lo:hi], "id long, val double, _op string, seq long"
        )
        state = cdc.merge_frames(state, batch, ["id"], ["seq"]).localCheckpoint()
    sequential = {(r["id"], r["val"]) for r in state.collect()}
    assert sequential == one_shot


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=14),  # bitrate index
            st.integers(min_value=0, max_value=2),   # sample-rate index
            st.integers(min_value=0, max_value=1),   # padding bit
        ),
        min_size=1,
        max_size=20,
    ),
    id3_pad=st.integers(min_value=0, max_value=200),
    plant_decoy=st.booleans(),
    trailing=st.sampled_from([b"", b"TAG" + bytes(30), b"\x00\x01"]),
)
def test_mp3_walk_matches_ground_truth_on_random_layouts(
    spark, frames, id3_pad, plant_decoy, trailing
):
    # random per-frame (bitrate, rate, padding) chains behind a random
    # ID3v2 tag (optionally carrying planted 0xFF sync bytes): the walk
    # must count exactly len(frames) — frame lengths derive from each
    # frame's OWN header, the tag skip is size-based, and trailing junk
    # ends the walk cleanly

    from tools.gen_media_fixture import MP3_BITRATES, MP3_RATES, mp3_frame

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        mp3_header_meta,
    )

    out = b""
    if id3_pad:
        body = (b"\xff\xfb\x90" if plant_decoy else b"pad") * (id3_pad // 3 + 1)
        body = body[:id3_pad]
        sz = len(body)
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + body
    for bi, sri, pad in frames:
        out += mp3_frame(bi, sri, pad)
    out += trailing
    df = spark.createDataFrame([(1, out)], "media_id long, payload binary")
    r = mp3_header_meta(df).collect()[0]
    bi0, sri0, _ = frames[0]
    assert (r["fmt"], r["bitrate_kbps"], r["sample_rate"]) == (
        "mp3",
        MP3_BITRATES[bi0 - 1],
        MP3_RATES[sri0],
    )
    assert r["n_frames"] == len(frames)
    assert r["duration_ms"] == len(frames) * 1152000 // MP3_RATES[sri0]


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    timescale=st.sampled_from([600, 1000, 90000, 44100]),
    duration=st.integers(min_value=0, max_value=10**9),
    n_traks=st.integers(min_value=0, max_value=5),
    pre_boxes=st.integers(min_value=0, max_value=6),
    v1=st.booleans(),
    extended_mdat=st.booleans(),
    decoy=st.booleans(),
    size0=st.booleans(),
)
def test_mp4_walk_matches_ground_truth_on_random_layouts(
    spark, timescale, duration, n_traks, pre_boxes, v1, extended_mdat, decoy, size0
):
    # random box layouts (free padding before moov, 64-bit mdat before
    # it, v0/v1 mvhd, trailing size-0 box, planted decoys): the nested
    # walk must recover the planted timescale/duration/trak count

    from tools.gen_media_fixture import mp4_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        mp4_header_meta,
    )

    payload = mp4_bytes(
        timescale, duration, n_traks=n_traks, pre_boxes=pre_boxes, v1=v1,
        extended_mdat=extended_mdat, decoy=decoy, mdat_last_size0=size0,
    )
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    r = mp4_header_meta(df).collect()[0]
    assert (r["fmt"], r["major_brand"], r["timescale"], r["n_tracks"]) == (
        "mp4", "isom", timescale, n_traks,
    )
    assert r["duration_ms"] == duration * 1000 // timescale


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big_endian=st.booleans(),
    long_types=st.booleans(),
    width=st.integers(min_value=1, max_value=65535),
    height=st.integers(min_value=1, max_value=65535),
    pre_tags=st.integers(min_value=0, max_value=4),
    bps=st.sampled_from([None, 1, 8, 16]),
    bps_count=st.sampled_from([1, 3]),
    gap=st.sampled_from([0, 6, 31]),
    junk_entries=st.integers(min_value=0, max_value=3),
    trailer=st.integers(min_value=0, max_value=40),
)
def test_tiff_ifd_scan_matches_ground_truth_on_random_layouts(
    spark, big_endian, long_types, width, height, pre_tags, bps, bps_count,
    gap, junk_entries, trailer,
):
    # random IFD layouts (both byte orders, SHORT/LONG dim types, junk
    # tags around the dims, gap before the IFD, offset-valued
    # BitsPerSample, trailing pixel junk): the endian-dispatched entry
    # scan must recover the planted values exactly

    from tools.gen_media_fixture import tiff_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        tiff_header_meta,
    )

    payload = tiff_bytes(
        width, height, big_endian=big_endian, long_types=long_types,
        pre_tags=pre_tags, bps=bps, bps_count=bps_count, gap=gap,
        junk_entries=junk_entries, trailer=trailer,
    )
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    r = tiff_header_meta(df).collect()[0]
    assert (r["fmt"], r["byte_order"]) == ("tiff", "MM" if big_endian else "II")
    assert (r["width"], r["height"]) == (width, height)
    expect_bps = bps if (bps is not None and bps_count == 1) else None
    assert r["bits_per_sample"] == expect_bps
    expect_n = pre_tags + 2 + (1 if bps is not None else 0) + junk_entries
    assert r["n_ifd_entries"] == expect_n


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.binary(min_size=0, max_size=300),
    fname=st.one_of(st.none(), st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0, max_size=20)),
    mtime=st.integers(min_value=0, max_value=2**32 - 1),
    ftext=st.booleans(),
    fextra_len=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
    os_code=st.sampled_from([0, 3, 7, 255]),
    fhcrc=st.booleans(),
    comment=st.booleans(),
)
def test_gzip_header_scan_matches_ground_truth(
    spark, data, fname, mtime, ftext, fextra_len, os_code, fhcrc, comment
):
    # random RFC 1952 members (real deflate bodies, every optional-field
    # combination, byte-valued names): the header decode must recover
    # the planted fields and the trailer ISIZE exactly

    from tools.gen_media_fixture import gzip_member

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        gzip_header_meta,
    )

    payload = gzip_member(
        data,
        fname=fname.encode("ascii") if fname is not None else None,
        mtime=mtime,
        ftext=ftext,
        fextra=bytes(range(fextra_len % 256))[:fextra_len]
        if fextra_len is not None else None,
        os_code=os_code,
        fhcrc=fhcrc,
        comment=b"c" if comment else None,
    )
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    r = gzip_header_meta(df).collect()[0]
    assert (r["fmt"], r["is_text"], r["mtime"], r["os_code"]) == (
        "gzip", ftext, mtime, os_code,
    )
    assert r["filename"] == fname
    assert r["isize"] == len(data)
