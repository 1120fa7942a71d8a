"""WER harness tests."""

from godot_whisper_tpu.cli.eval import (edit_distance, normalize_text,
                                        word_error_rate)


def test_normalize():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("[noise] go <unk> now") == "go now"
    assert normalize_text("naïve  café") == "naive cafe"


def test_edit_distance_identity():
    s, d, i, total = edit_distance(["a", "b", "c"], ["a", "b", "c"])
    assert (s, d, i, total) == (0, 0, 0, 0)


def test_edit_distance_counts():
    # ref: a b c d ; hyp: a x c  -> 1 sub (b->x), 1 del (d)
    s, d, i, total = edit_distance(list("abcd"), list("axc"))
    assert total == 2
    assert s == 1 and d == 1 and i == 0


def test_wer():
    r = word_error_rate("the quick brown fox", "the quick brown fox")
    assert r["wer"] == 0.0
    r = word_error_rate("the quick brown fox", "the slow brown fox jumped")
    assert r["sub"] == 1 and r["ins"] == 1
    assert abs(r["wer"] - 0.5) < 1e-9


def test_wer_empty_hyp():
    r = word_error_rate("one two three", "")
    assert r["wer"] == 1.0
    assert r["del"] == 3
