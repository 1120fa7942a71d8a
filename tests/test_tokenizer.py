"""Tokenizer tests using the real vocab from the reference stub checkpoints."""

import pytest

from godot_whisper_tpu.audio.tokenizer import Tokenizer, synthetic_vocab
from godot_whisper_tpu.models.config import get_config


@pytest.fixture(scope="module")
def tok(stub_tiny_en):
    return Tokenizer(stub_tiny_en.config, stub_tiny_en.vocab_tokens)


def test_roundtrip_simple(tok):
    ids = tok.encode("And so my fellow Americans")
    assert len(ids) > 0
    assert tok.decode(ids) == "And so my fellow Americans"


def test_roundtrip_punctuation(tok):
    text = " ask not what your country can do for you, ask what you can do."
    assert tok.decode(tok.encode(text)) == text


def test_contractions(tok):
    text = "don't you think it's great"
    assert tok.decode(tok.encode(text)) == text


def test_greedy_longest_match(tok):
    # " the" must be one token, not 4 characters
    ids = tok.encode(" the")
    assert len(ids) == 1


def test_special_token_synthesis(tok):
    cfg = tok.config
    # stub vocab has 51864 tokens? tail tokens synthesized when shorter
    assert tok.token_str(cfg.token_beg) in ("[_BEG_]", "<|0.00|>")
    assert tok.token_str(cfg.token_eot) in ("[_EOT_]", "<|endoftext|>")


def test_decode_skips_specials(tok):
    cfg = tok.config
    ids = tok.encode("hello") + [cfg.token_eot, cfg.token_beg]
    assert tok.decode(ids) == "hello"
    assert "hello" in tok.decode(ids, skip_special=False)


def test_multilingual_lang_tokens(stub_tiny_multi):
    tok = Tokenizer(stub_tiny_multi.config, stub_tiny_multi.vocab_tokens)
    cfg = stub_tiny_multi.config
    en_token = cfg.token_lang(0)
    assert en_token == cfg.token_sot + 1
    s = tok.token_str(en_token)
    assert "en" in s


def test_non_speech_token_ids(tok):
    ids = tok.non_speech_token_ids()
    assert len(ids) > 20
    # every listed id decodes to a non-speech string
    for i in ids[:5]:
        assert tok.token_str(i).strip() != ""


def test_synthetic_vocab():
    cfg = get_config("tiny.en")
    tok = Tokenizer(cfg, synthetic_vocab(cfg))
    assert len(tok.id_to_token) == cfg.n_vocab
    assert tok.decode(tok.encode("abc")) == "abc"
