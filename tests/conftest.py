"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; jax's host-platform device-count
override is the TPU equivalent of a fake backend (SURVEY.md section 4). Must run
before jax initializes its backends.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the container's sitecustomize imports jax at interpreter start, capturing
# JAX_PLATFORMS before this file runs — override programmatically too
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Build the native C++ libraries (tokenizer + image pipe) if absent/stale.
# The .so blobs are not committed; tests that need them would otherwise skip.
import shutil
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
if shutil.which("make") and shutil.which(os.environ.get("CXX", "g++")):
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=False,
                   capture_output=True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_text_cfg():
    from candidate_reranking_cir_tpu.config import TextEncoderConfig

    return TextEncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=4, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, encoder_width=24,
        hidden_dropout=0.0, attention_dropout=0.0, merge_mlp_from=2)


@pytest.fixture(scope="session")
def tiny_vit_cfg():
    from candidate_reranking_cir_tpu.config import ViTConfig

    return ViTConfig(image_size=32, patch_size=8, hidden_size=24, num_layers=2,
                     num_heads=4)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled-executable memory between test modules.

    The suite compiles several hundred CPU programs (full-config parity
    models among them); with everything cached in-process, the XLA CPU
    compiler segfaulted on the heaviest compile near the end of the full
    run (jax _src/compiler.py backend_compile_and_load — reproducible at
    ~190 accumulated tests, never in isolation). Dropping the caches per
    module keeps peak compiler memory bounded; intra-module reuse (where
    the real wins are) is unaffected.
    """
    yield
    import jax as _jax

    _jax.clear_caches()
