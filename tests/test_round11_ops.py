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
