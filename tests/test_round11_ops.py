"""Round-11 operator tests: BPE end-of-word serving (parity vs the
sequential textbook reference, the trained-with/served-without guard,
the marker-collision drop), the greedy longest-match serve path
(bpe_segment_vocab, t35), trained-centroid cluster quality (v21), and
the real image-header multimodal kernel (m03)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_round9_ops import _sequential_bpe


# --- BPE end-of-word serving ----------------------------------------------


def test_bpe_train_eow_matches_sequential_reference(spark):
    # the end_of_word variant must replay the textbook trainer with the
    # marker appended to every word — including word-FINAL merges the
    # marker exists to make learnable (previously only the eow=False
    # path had this parity pin)
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest low"),
            (3, "wide wider widest new new"),
        ],
        ["doc_id", "text"],
    )
    freqs: dict[str, int] = {}
    for _, text in docs.collect():
        for w in text.split():
            freqs[w] = freqs.get(w, 0) + 1
    expected = _sequential_bpe(freqs, 6, eow=True)
    got = [
        (r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6, end_of_word=True)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected
    # the marker actually participates: at least one learned merge
    # involves a word-final unit
    assert any("</w>" in m for _, _, m, _ in got)


def test_bpe_eow_drops_marker_collision_words(spark):
    # a corpus word containing '<'/'>' could merge into the literal
    # '</w>' string and be conflated with the boundary marker — the eow
    # start state drops such words (and ONLY such words)
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "a</w>b a</w>b a</w>b a</w>b ok ok ok")], ["doc_id", "text"]
    )
    merges = bpe_train(docs, n_merges=2, end_of_word=True)
    rows = merges.collect()
    # only 'ok' trains: no symbol ever contains '<' or '>' except the
    # genuine marker, and the hottest pair comes from 'ok', not the
    # higher-frequency collision word
    assert all(
        "<" not in r["left_sym"].replace("</w>", "")
        and "<" not in r["right_sym"].replace("</w>", "")
        for r in rows
    )
    # (o,k) and (k,</w>) tie at 3 → lexicographic left asc → (k,</w>)
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("k", "</w>")
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("o", "k</w>")
    vocab = {r["symbol"] for r in bpe_vocab(docs, merges, end_of_word=True).collect()}
    assert all("<" not in s.replace("</w>", "") for s in vocab)
    # eow=False keeps the collision word (the guard is eow-only)
    plain = bpe_train(docs, n_merges=1)
    assert plain.collect()[0]["pair_count"] >= 4


def test_bpe_segment_frame_eow_serves_marker_merges(spark):
    # an eow-trained table served WITH the flag applies word-final
    # merges; the marker lands attached to the final subword
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_frame,
    )

    merges = spark.createDataFrame(
        [(1, "w", "</w>"), (2, "o", "w</w>")],
        "merge_rank int, left_sym string, right_sym string",
    )
    df = spark.createDataFrame([(1, "low lower"), (2, "")], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_segment_frame(df, merges, end_of_word=True).collect()
    }
    # low → l ow</w>; lower → l o w e r </w> (the w</w> merge needs w
    # word-final, which 'lower' doesn't have)
    assert got[1] == (2, 8, "l ow</w> l o w e r </w>")
    assert got[2] == (0, 0, "")


def test_bpe_serve_flag_mismatch_fails_loudly(spark):
    # serving an eow-trained table without the flag silently skipped all
    # marker merges before; now it raises on both serve paths
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_frame,
        bpe_vocab,
    )

    merges = spark.createDataFrame(
        [(1, "w", "</w>")], "merge_rank int, left_sym string, right_sym string"
    )
    df = spark.createDataFrame([(1, "low")], ["doc_id", "text"])
    with pytest.raises(Exception, match="end_of_word"):
        bpe_segment_frame(df, merges).collect()
    with pytest.raises(ValueError, match="end_of_word"):
        bpe_segment(df, [("w", "</w>")])
    with pytest.raises(Exception, match="end_of_word"):
        bpe_vocab(df, merges).collect()


# --- IVF search under a trained centroid frame (v22) ------------------------


def test_ivf_topk_frame_matches_literal_variant(spark):
    # fed the SAME centroids, the frame-based IVF must reproduce the
    # literal-based one row for row (binning, probe order, verify)
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_frame,
    )

    vecs = spark.createDataFrame(
        [(i, [1.0 * ((i * 3) % 5), 0.5 * ((i + 2) % 4), 0.25 * (i % 3)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.1, 0.0], [0.0, 1.0, 0.2], [0.3, 0.0, 1.0], [0.5, 0.5, 0.5]]
    qs = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    lit = sorted(map(tuple, ivf_topk(vecs, qs, cents, k=4, nprobe=2).collect()))
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, centroid array<double>"
    )
    framed = sorted(
        map(tuple, ivf_topk_frame(vecs, qs, cdf, k=4, nprobe=2).collect())
    )
    assert framed == lit and len(framed) == 8


# --- semantic benchmark contamination (v24) ---------------------------------


def test_semantic_contamination_finds_planted_paraphrase(spark):
    # a bench vector planted as a near-duplicate of a corpus vector must
    # surface as an evidence pair through the IVF-pruned path, and the
    # anti-join removal must drop exactly the contaminated corpus row
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        semantic_contamination,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    corpus = spark.createDataFrame(
        [
            (1, [0.95, 0.05, 0.0]),   # ≈ bench item 100 → contaminated
            (2, [0.0, 1.0, 0.1]),
            (3, [0.1, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [0.96, 0.04, 0.0])], "bench_id long, bench_vec array<double>"
    )
    pairs = semantic_contamination(
        corpus, bench, cents, threshold=0.9, nprobe=2
    )
    got = [(r["vec_id"], r["bench_id"]) for r in pairs.collect()]
    assert got == [(1, 100)]
    clean = corpus.join(pairs.select("vec_id"), "vec_id", "left_anti")
    assert sorted(r["vec_id"] for r in clean.collect()) == [2, 3]


def test_semantic_contamination_prunes_before_scoring(spark):
    # nprobe=1 restricts each bench item to ONE centroid list: a
    # high-cosine pair whose corpus vector lives in an unprobed list
    # must NOT surface — the pruning is real, not decorative
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        semantic_contamination,
    )

    # corpus vector sits closest to centroid 1; the bench probe (with
    # nprobe=1) goes to centroid 0 — despite cosine ≈ 0.97 the pair is
    # pruned away; nprobe=2 then finds it
    cents = [[1.0, 0.0], [0.8, 0.6]]
    corpus = spark.createDataFrame(
        [(1, [0.85, 0.52])], "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [(100, [0.95, 0.31])], "bench_id long, bench_vec array<double>"
    )
    narrow = semantic_contamination(corpus, bench, cents, threshold=0.9, nprobe=1)
    assert narrow.count() == 0
    wide = semantic_contamination(corpus, bench, cents, threshold=0.9, nprobe=2)
    assert wide.count() == 1


# --- audio header decode (m04) ----------------------------------------------


def test_audio_header_meta_parses_wav_and_skips_decoys(spark):
    from tools.gen_media_fixture import wav_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        audio_header_meta,
    )

    rows = [
        (1, wav_bytes(2, 44100, 16, 1000, list_pad=11)),
        # decoy 'fmt ' bytes inside the data payload: the aligned walk
        # jumps the whole chunk and must keep the REAL fmt fields
        (2, wav_bytes(1, 8000, 8, 500, decoy=True)),
        (3, b"RIFF\x08\x00\x00\x00WAVE"),  # truncated: no chunks
        (4, b"not audio at all, clearly"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_header_meta(df).collect()}
    assert (
        got[1]["fmt"],
        got[1]["n_channels"],
        got[1]["sample_rate"],
        got[1]["bits_per_sample"],
        got[1]["data_bytes"],
        got[1]["duration_ms"],
    ) == ("wav", 2, 44100, 16, 4000, 4000 * 1000 // (44100 * 4))
    assert (got[2]["fmt"], got[2]["sample_rate"], got[2]["data_bytes"]) == (
        "wav",
        8000,
        500,
    )
    assert (got[3]["fmt"], got[3]["sample_rate"]) == ("wav", None)
    assert (got[4]["fmt"], got[4]["sample_rate"]) == ("unknown", None)


# --- packing by precomputed token counts (ll13) -----------------------------


def test_pack_sequences_counted_matches_manual_prefix_sum(spark):
    # count_col packs by a PRECOMPUTED per-doc count (the real
    # tokenizer's), standardized to n_tokens; offsets/seq assignment
    # must equal the sequential prefix-sum reference
    from realtimechurnpredictiondataengineering_spark.operators.packing import (
        pack_sequences,
        sequence_stats,
    )

    counts = [(1, 300), (2, 150), (3, 200), (4, 60), (5, 500)]
    df = spark.createDataFrame(counts, "doc_id long, n_bpe_tokens int")
    packed = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["seq_id"])
        for r in pack_sequences(df, budget=512, count_col="n_bpe_tokens").collect()
    }
    off = 0
    for doc_id, n in counts:
        assert packed[doc_id] == (n, off, off // 512), doc_id
        off += n
    stats = {
        r["seq_id"]: (r["n_docs"], r["seq_tokens"])
        for r in sequence_stats(
            pack_sequences(df, budget=512, count_col="n_bpe_tokens")
        ).collect()
    }
    # offsets 0,300,450,650,710 → seq 0: docs 1,2,3; seq 1: docs 4,5
    assert stats == {0: (3, 650), 1: (2, 560)}


# --- real image-header kernel (m03) ----------------------------------------


def test_media_header_dims_parses_real_headers(spark):
    from tools.gen_media_fixture import jpeg_bytes, png_bytes

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        media_header_dims,
    )

    rows = [
        (1, png_bytes(640, 480, pad=10)),
        (2, jpeg_bytes(1920, 1080, "hello", app1=True)),
        (3, b"\xff\xd8\xff\xd9"),  # truncated: SOI+EOI, no frame header
        (4, b"plain text, not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in media_header_dims(df).collect()}
    assert (got[1]["fmt"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["fmt"], got[2]["width"], got[2]["height"]) == ("jpeg", 1920, 1080)
    assert (got[3]["fmt"], got[3]["width"], got[3]["height"]) == ("jpeg", None, None)
    assert (got[4]["fmt"], got[4]["width"]) == ("unknown", None)
    assert got[2]["n_bytes"] == len(rows[1][1])


def test_media_header_walk_is_byte_aligned_not_a_scan(spark):
    # a COM segment whose PAYLOAD contains the literal bytes FF C0 (a
    # fake SOF marker) must not fool the parser: the walk jumps marker
    # -> declared length -> next marker, it never substring-scans, so
    # embedded marker bytes inside a segment body are never visited
    import struct

    from realtimechurnpredictiondataengineering_spark.operators.multimodal import (
        media_header_dims,
    )

    fake = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(
        ">HH", 99, 77
    )  # decoy SOF claiming 77x99
    com = b"\xff\xfe" + struct.pack(">H", len(fake) + 2) + fake
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + bytes([8])
        + struct.pack(">HH", 600, 800)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    payload = b"\xff\xd8" + com + sof0 + b"\xff\xd9"
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    r = media_header_dims(df).collect()[0]
    assert (r["fmt"], r["width"], r["height"]) == ("jpeg", 800, 600)


# --- trained-centroid cluster quality (v21) --------------------------------


def test_kmeans_centroids_consistent_with_assignment(spark):
    # the exposed centroid frame must be the SAME artifact kmeans_lloyd
    # assigns against: re-assigning every vector to its nearest trained
    # centroid reproduces kmeans_lloyd's assignment exactly
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_lloyd,
    )

    rows = [
        (i, [float((i * 7) % 5), float((i * 3) % 4)]) for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign = {
        r["vec_id"]: r["cluster"] for r in kmeans_lloyd(df, k=3, rounds=2).collect()
    }
    cents = {
        r["cluster"]: r["centroid"]
        for r in kmeans_centroids(df, k=3, rounds=2).collect()
    }
    assert sorted(cents) == [0, 1, 2]
    for vid, vec in rows:
        dists = {
            c: round(sum((a - b) ** 2 for a, b in zip(vec, cv)), 9)
            for c, cv in cents.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert assign[vid] == best, (vid, dists, assign[vid])


def test_cluster_quality_frame_matches_literal_report(spark):
    # fed the same centroids, the frame-based report must equal the
    # literal-based one row for row
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        cluster_quality_frame,
        cluster_quality_report,
    )

    vecs = spark.createDataFrame(
        [(i, [1.0 * (i % 3), 0.5 * ((i + 1) % 4), 0.25]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]]
    lit = sorted(map(tuple, cluster_quality_report(vecs, cents).collect()))
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cluster int, centroid array<double>",
    )
    framed = sorted(map(tuple, cluster_quality_frame(vecs, cdf).collect()))
    assert framed == lit


def test_cluster_quality_frame_needs_two_centroids(spark):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        cluster_quality_frame,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cluster int, centroid array<double>"
    )
    with pytest.raises(Exception, match="2 centroids"):
        cluster_quality_frame(vecs, one).collect()


# --- greedy longest-match serve (bpe_segment_vocab, t35) -------------------


def _greedy_longest_match(word: str, vocab: set[str], eow: bool = False) -> list[str]:
    # sequential reference: at each position take the longest vocabulary
    # symbol prefixing the remainder, falling back to the single char
    s = word + "</w>" if eow else word
    out, i = [], 0
    while i < len(s):
        best = s[i]
        for l in range(min(len(s) - i, max(map(len, vocab), default=1)), 0, -1):
            if s[i : i + l] in vocab:
                best = s[i : i + l]
                break
        out.append(best)
        i += len(best)
    return out


def test_bpe_segment_vocab_matches_sequential_greedy(spark):
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_vocab,
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest low"),
            (3, "wide wider widest new new"),
        ],
        ["doc_id", "text"],
    )
    for eow in (False, True):
        merges = bpe_train(docs, n_merges=6, end_of_word=eow)
        vocab_df = bpe_vocab(docs, merges, end_of_word=eow)
        vocab = {r["symbol"] for r in vocab_df.collect()}
        got = {
            r["doc_id"]: r["bpe_text"]
            for r in bpe_segment_vocab(docs, vocab_df, end_of_word=eow).collect()
        }
        for doc_id, text in [(1, "low low low lower lowest"),
                             (2, "new newer newest low"),
                             (3, "wide wider widest new new")]:
            expected = " ".join(
                t for w in text.split() for t in _greedy_longest_match(w, vocab, eow)
            )
            assert got[doc_id] == expected, (eow, doc_id)


def test_bpe_segment_vocab_agrees_with_replay_on_trained_fixture(spark):
    # on THIS trained table the two serve semantics coincide — the
    # agreement t35 leans on for cross-checking; they are NOT equal in
    # general (next test pins a counterexample)
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_frame,
        bpe_segment_vocab,
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        ["doc_id", "text"],
    )
    merges = bpe_train(docs, n_merges=6, end_of_word=True)
    vocab_df = bpe_vocab(docs, merges, end_of_word=True)
    lm = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_segment_vocab(docs, vocab_df, end_of_word=True).collect()
    }
    rep = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_segment_frame(docs, merges, end_of_word=True).collect()
    }
    assert lm == rep


def test_bpe_longest_match_vs_replay_divergence_is_real(spark):
    # the documented BPE/WordPiece serving divergence, pinned with a
    # found counterexample: on 'bcaca' the trained vocabulary contains
    # both 'bc' and 'ca', and merge-ORDER replay applies the earlier
    # merge first ('... c a' tail) while longest-match greedily eats
    # 'ca' at a position replay never forms.  Divergence is expected;
    # what BOTH serve paths must preserve: (a) tokens concatenate back
    # to the input, (b) every token is a vocabulary symbol or a
    # single-character fallback.
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_frame,
        bpe_segment_vocab,
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "aa caccab aa abc cb cba c bcc bcaca")], ["doc_id", "text"]
    )
    merges = bpe_train(docs, n_merges=4)
    vocab_df = bpe_vocab(docs, merges)
    vocab = {r["symbol"] for r in vocab_df.collect()}
    lm = bpe_segment_vocab(docs, vocab_df).collect()[0]["bpe_text"]
    rep = bpe_segment_frame(docs, merges).collect()[0]["bpe_text"]
    assert lm != rep  # the divergence is real on this corpus
    # shared invariants: reconstruction + vocabulary-only tokens
    for out in (lm, rep):
        assert out.replace(" ", "") == "aacaccabaaabccbcbacbccbcaca"
        assert all(t in vocab or len(t) == 1 for t in out.split())


def test_bpe_segment_vocab_fallback_and_empty_docs(spark):
    # serve input with characters the vocabulary never saw falls back
    # to single-character tokens; empty documents yield (0, 0, '')
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_vocab,
    )

    vocab_df = spark.createDataFrame(
        [("ab", 3), ("a", 5), ("b", 4)], "symbol string, n_occurrences long"
    )
    df = spark.createDataFrame([(1, "abxy ab"), (2, "")], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_segment_vocab(df, vocab_df).collect()
    }
    assert got[1] == (2, 4, "ab x y ab")
    assert got[2] == (0, 0, "")


def test_bpe_segment_vocab_eow_guard_and_plan_width(spark):
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        bpe_segment_vocab,
    )

    eow_vocab = spark.createDataFrame(
        [("ow</w>", 3), ("l", 5)], "symbol string, n_occurrences long"
    )
    df = spark.createDataFrame([(1, "low")], ["doc_id", "text"])
    with pytest.raises(Exception, match="end_of_word"):
        bpe_segment_vocab(df, eow_vocab).collect()
    assert (
        bpe_segment_vocab(df, eow_vocab, end_of_word=True).collect()[0]["bpe_text"]
        == "l ow</w>"
    )
    # the vocabulary rides the broadcast as DATA, not as literals: the
    # analyzed plan must not grow with vocabulary size (the fold path's
    # round-10 lesson, inherited by construction here)
    import string

    big = spark.createDataFrame(
        [(a + b, 1) for a in string.ascii_lowercase for b in string.ascii_lowercase],
        "symbol string, n_occurrences long",
    )
    seg = bpe_segment_vocab(df, big)
    tree = seg._jdf.queryExecution().analyzed().treeString()
    assert len(tree) < 10_000, f"plan grew with vocab size: {len(tree)} chars"


def test_bpe_segment_eow_literal_path(spark):
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([(1, "low lower")], ["doc_id", "text"])
    out = bpe_segment(
        df, [("w", "</w>"), ("o", "w</w>")], end_of_word=True
    ).collect()[0]["bpe_tokens"]
    assert out == ["l", "ow</w>", "l", "o", "w", "e", "r", "</w>"]
    # zero merges: character segmentation plus the marker
    out0 = bpe_segment(df, [], end_of_word=True).collect()[0]["bpe_tokens"]
    assert out0 == ["l", "o", "w", "</w>", "l", "o", "w", "e", "r", "</w>"]
