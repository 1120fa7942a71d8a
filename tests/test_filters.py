"""Rule-by-rule logit-filter tests with crafted logits
(whisper_process_logits semantics, whisper.cpp:4489-4775)."""

import numpy as np
import pytest

import jax.numpy as jnp

from godot_whisper_tpu.decode.filters import (FilterContext,
                                              build_filter_context,
                                              process_logits)
from godot_whisper_tpu.models.config import get_config


@pytest.fixture(scope="module")
def cfg():
    return get_config("tiny.en")


@pytest.fixture(scope="module")
def fctx(cfg):
    return build_filter_context(cfg, None, max_initial_ts=1.0)


def _run(fctx, logits, **kw):
    B = logits.shape[0]
    defaults = dict(
        temperature=jnp.float32(0.0),
        is_initial=jnp.zeros((B,), bool),
        last_token=jnp.full((B,), -1, jnp.int32),
        penult_token=jnp.full((B,), -1, jnp.int32),
        n_tokens=jnp.zeros((B,), jnp.int32),
        has_ts=jnp.zeros((B,), bool),
        seek_delta=jnp.full((B,), 3000, jnp.int32),
        suppress_blank=True, no_timestamps=False)
    defaults.update(kw)
    lg, lp, probs = process_logits(jnp.asarray(logits), fctx=fctx,
                                   **defaults)
    return np.asarray(lg), np.asarray(lp), np.asarray(probs)


def _flat(cfg, val=1.0):
    """Flat logits with the text region biased up so the ts-sum rule
    (rule 11) does not fire — 1501 equal-probability timestamps would
    otherwise out-sum any text token (correct reference behavior, but not
    what these per-rule tests probe)."""
    x = np.full((1, cfg.n_vocab), val, dtype=np.float32)
    x[:, :cfg.token_beg] += 8.0
    return x


def test_static_suppressions(cfg, fctx):
    lg, _, probs = _run(fctx, _flat(cfg))
    for tid in (cfg.token_not, cfg.token_sot, cfg.token_nosp,
                cfg.token_solm, cfg.token_translate, cfg.token_transcribe,
                cfg.token_prev):
        assert probs[0, tid] == 0.0, tid


def test_suppress_blank_at_start(cfg, fctx):
    lg, _, probs = _run(fctx, _flat(cfg),
                        is_initial=jnp.asarray([True]))
    assert probs[0, cfg.token_eot] == 0.0
    assert probs[0, fctx.space_id] == 0.0
    # not initial: eot allowed
    _, _, probs2 = _run(fctx, _flat(cfg), n_tokens=jnp.asarray([3]),
                        last_token=jnp.asarray([100]),
                        penult_token=jnp.asarray([100]))
    assert probs2[0, cfg.token_eot] > 0.0


def test_timestamp_pairing_forces_text_block(cfg, fctx):
    """After ts,ts -> further timestamps banned; after text,ts -> text
    banned (must close the pair), except EOT stays legal."""
    beg = cfg.token_beg
    # last and penult both timestamps
    _, _, p = _run(fctx, _flat(cfg), n_tokens=jnp.asarray([2]),
                   last_token=jnp.asarray([beg + 5]),
                   penult_token=jnp.asarray([beg + 4]))
    assert p[0, beg + 10] == 0.0      # no more timestamps
    assert p[0, 100] > 0.0            # text fine

    # only last is a timestamp: text blocked, ts/eot allowed
    _, _, p = _run(fctx, _flat(cfg), n_tokens=jnp.asarray([3]),
                   last_token=jnp.asarray([beg + 5]),
                   penult_token=jnp.asarray([100]))
    assert p[0, 100] == 0.0
    assert p[0, beg + 6] > 0.0
    assert p[0, cfg.token_eot] > 0.0


def test_max_initial_ts_cap(cfg, fctx):
    """At start, timestamps beyond 1.0 s (tid > beg+50) are banned
    (whisper.cpp:4616-4625)."""
    beg = cfg.token_beg
    _, _, p = _run(fctx, _flat(cfg), is_initial=jnp.asarray([True]))
    assert p[0, beg + 50] > 0.0
    assert p[0, beg + 51] == 0.0


def test_monotonic_timestamps(cfg, fctx):
    """With has_ts and seek_delta=100, timestamps below beg+50 are banned
    (whisper.cpp:4627-4635)."""
    beg = cfg.token_beg
    _, _, p = _run(fctx, _flat(cfg), n_tokens=jnp.asarray([4]),
                   last_token=jnp.asarray([200]),
                   penult_token=jnp.asarray([beg + 50]),
                   has_ts=jnp.asarray([True]),
                   seek_delta=jnp.asarray([100]))
    assert p[0, beg + 49] == 0.0
    assert p[0, beg + 50] > 0.0


def test_ts_sum_rule_forces_timestamp(cfg, fctx):
    """If summed timestamp probability beats the best text token, text is
    zeroed (whisper.cpp:4657-4709)."""
    beg = cfg.token_beg
    logits = np.full((1, cfg.n_vocab), -10.0, dtype=np.float32)
    # many moderately-likely timestamps vs one text token
    logits[0, beg:beg + 100] = 3.0
    logits[0, 100] = 4.0  # best text token, but logsumexp(ts) >> 4
    _, _, p = _run(fctx, logits, n_tokens=jnp.asarray([2]),
                   last_token=jnp.asarray([100]),
                   penult_token=jnp.asarray([101]))
    assert p[0, 100] == 0.0
    assert p[0, beg + 10] > 0.0


def test_no_timestamps_mode(cfg, fctx):
    beg = cfg.token_beg
    _, _, p = _run(fctx, _flat(cfg), no_timestamps=True,
                   n_tokens=jnp.asarray([1]),
                   last_token=jnp.asarray([100]))
    assert p[0, beg:].sum() == 0.0


def test_temperature_scaling(cfg, fctx):
    # gap vs the timestamp region must survive /T so rule 11 stays quiet:
    # log(1501) ~ 7.3, so text needs > 7.3 after scaling by T=2
    logits = _flat(cfg, 0.0)
    logits[0, 100] = 30.0
    logits[0, 200] = 28.0
    _, _, p_cold = _run(fctx, logits, n_tokens=jnp.asarray([1]),
                        last_token=jnp.asarray([50]))
    _, _, p_hot = _run(fctx, logits, n_tokens=jnp.asarray([1]),
                       last_token=jnp.asarray([50]),
                       temperature=jnp.float32(2.0))
    # higher temperature flattens the ratio
    assert (p_hot[0, 100] / p_hot[0, 200]) < (p_cold[0, 100] / p_cold[0, 200])


def test_probs_normalized(cfg, fctx):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, cfg.n_vocab)).astype(np.float32)
    logits[:, :cfg.token_beg] += 8.0  # keep rule 11 quiet
    _, lp, p = _run(fctx, logits, n_tokens=jnp.asarray([1, 1]),
                    last_token=jnp.asarray([50, 60]))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
    # logprobs consistent with probs
    mask = p > 0
    np.testing.assert_allclose(np.exp(lp[mask]), p[mask], rtol=1e-4)
