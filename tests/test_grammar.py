"""GBNF grammar engine tests: parser, acceptance, token rejection, and the
host-stepped decode integration."""

import numpy as np
import pytest

from godot_whisper_tpu.decode.grammar import (Grammar, PartialUtf8,
                                              decode_utf8, grammar_from_gbnf,
                                              parse_gbnf)


def test_decode_utf8_ascii():
    cps, partial = decode_utf8(b"abc", PartialUtf8())
    assert cps == [97, 98, 99, 0]
    assert partial.n_remain == 0


def test_decode_utf8_multibyte():
    cps, partial = decode_utf8("é♪".encode(), PartialUtf8())
    assert cps == [0xE9, 0x266A, 0]


def test_decode_utf8_partial():
    raw = "é".encode()  # 2 bytes
    cps, partial = decode_utf8(raw[:1], PartialUtf8())
    assert cps == [0]
    assert partial.n_remain == 1
    cps2, partial2 = decode_utf8(raw[1:], partial)
    assert cps2 == [0xE9, 0]
    assert partial2.n_remain == 0


def test_parse_simple_grammar():
    rules, symbols = parse_gbnf('root ::= "yes" | "no"\n')
    assert "root" in symbols
    assert len(rules[symbols["root"]]) > 0


def test_grammar_accepts_valid_string():
    g = grammar_from_gbnf('root ::= "yes" | "no"\n')
    for ch in b"yes":
        g._accept_char(ch)
    # after "yes" some stack must be complete (empty stack present)
    assert any(len(s) == 0 for s in g.stacks)


def test_grammar_rejects_invalid_prefix():
    g = grammar_from_gbnf('root ::= "yes" | "no"\n')
    g._accept_char(ord("x"))
    assert g.stacks == []  # dead


def test_reject_tokens_vocabulary():
    g = grammar_from_gbnf('root ::= "yes" | "no"\n')
    vocab = [b"yes", b"no", b"maybe", b"y", b"n", b"q", b""]
    eot = len(vocab)
    rejected = set(g.reject_tokens(vocab, eot))
    # "maybe" and "q" cannot start a valid derivation; "y"/"n"/"yes"/"no" can
    assert 2 in rejected and 5 in rejected
    assert 0 not in rejected and 1 not in rejected
    assert 3 not in rejected and 4 not in rejected


def test_reject_after_acceptance():
    g = grammar_from_gbnf('root ::= "yes" | "no"\n')
    g.accept_token(b"y")
    vocab = [b"es", b"o", b"x", b"e"]
    rejected = set(g.reject_tokens(vocab, len(vocab)))
    assert 1 in rejected and 2 in rejected  # "o"/"x" invalid after "y"
    assert 0 not in rejected and 3 not in rejected


def test_char_ranges():
    g = grammar_from_gbnf('root ::= [0-9]+\n')
    vocab = [b"1", b"42", b"a", b" ", b"9"]
    rejected = set(g.reject_tokens(vocab, len(vocab)))
    assert rejected == {2, 3}


def test_specials_skip_acceptance():
    g = grammar_from_gbnf('root ::= "ok"\n')
    stacks_before = list(g.stacks)
    g.accept_token(b"[_BEG_]")
    assert g.stacks == stacks_before


def test_host_loop_grammar_decode():
    """End-to-end: grammar penalty steers a random-weight model's output."""
    import jax.numpy as jnp

    import godot_whisper_tpu as gwt
    from godot_whisper_tpu.audio.mel import mel_filterbank
    from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
    from godot_whisper_tpu.decode.loop import WhisperPipeline
    from godot_whisper_tpu.models.params import init_params

    cfg = gwt.get_config("tiny.en").replace(
        n_audio_layer=1, n_text_layer=1, n_audio_state=64, n_audio_head=2,
        n_text_state=64, n_text_head=2, name="pico")
    params = init_params(cfg, seed=0, compute_dtype=jnp.float32)
    tokenizer = Tokenizer(cfg, synthetic_vocab(cfg))
    pipe = WhisperPipeline(cfg, params, tokenizer, mel_filterbank(80),
                           n_loaded=1)
    ctx = gwt.WhisperContext(pipe)

    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(2 * 16000)).astype(np.float32)
    p = gwt.TranscribeParams(best_of=1, temperature_inc=0.0,
                             grammar_rules='root ::= [a-z ]+\n',
                             no_timestamps=True)
    segs = ctx.full(p, audio)
    text = "".join(s.text for s in segs)
    # with a huge-penalty grammar over [a-z ], output chars are a-z/space
    for ch in text:
        assert ch.islower() or ch == " " or ch == "", text
