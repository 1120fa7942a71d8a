"""Test configuration: force an 8-device virtual CPU mesh.

Tests run entirely on CPU (the single real TPU chip is reserved for
benches); multi-chip sharding paths are exercised on the virtual devices,
mirroring SURVEY.md §4's recommendation.
"""

import os

# Hard-override the platform: the hosting environment pre-sets
# JAX_PLATFORMS=axon (the TPU tunnel) and its sitecustomize registers the
# plugin at interpreter startup, so the env var alone is not enough —
# jax.config must be updated before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
STUB_TINY_EN = (REFERENCE_DIR +
                "/thirdparty/whisper.cpp/models/for-tests-ggml-tiny.en.bin")
STUB_TINY = (REFERENCE_DIR +
             "/thirdparty/whisper.cpp/models/for-tests-ggml-tiny.bin")
STUB_BASE = (REFERENCE_DIR +
             "/thirdparty/whisper.cpp/models/for-tests-ggml-base.bin")
JFK_WAV = REFERENCE_DIR + "/thirdparty/whisper.cpp/samples/jfk.wav"


@pytest.fixture(scope="session")
def stub_tiny_en():
    """RawCheckpoint of the reference's weightless tiny.en stub (real vocab
    + real mel filters, zero tensors)."""
    from godot_whisper_tpu.models.loader_ggml import read_checkpoint
    if not os.path.exists(STUB_TINY_EN):
        pytest.skip("reference stub checkpoint not available")
    return read_checkpoint(STUB_TINY_EN)


@pytest.fixture(scope="session")
def stub_tiny_multi():
    from godot_whisper_tpu.models.loader_ggml import read_checkpoint
    if not os.path.exists(STUB_TINY):
        pytest.skip("reference stub checkpoint not available")
    return read_checkpoint(STUB_TINY)


@pytest.fixture(scope="session")
def jfk_audio():
    """The canonical 11 s test clip, decoded to 16 kHz float32 mono."""
    from godot_whisper_tpu.audio.wav import read_wav
    if not os.path.exists(JFK_WAV):
        pytest.skip("jfk.wav not available")
    samples, rate = read_wav(JFK_WAV)
    assert rate == 16000
    return samples


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_addoption(parser):
    parser.addoption("--golden-regen", action="store_true", default=False,
                     help="regenerate tests/golden/ decode transcripts")
