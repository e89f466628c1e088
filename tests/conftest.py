"""Test config: force JAX onto a virtual 8-device CPU mesh so sharding tests
run without TPU hardware.  Must run before any jax import."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# some environments force-register a TPU plugin from sitecustomize before
# conftest runs; pin the platform at the config level too
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def load_yuv8(path, w, h, frame=0):
    fsz = w * h * 3 // 2
    raw = np.fromfile(path, dtype=np.uint8)[frame * fsz:(frame + 1) * fsz]
    y = raw[:w * h].reshape(h, w).astype(np.int32)
    u = raw[w * h:w * h + w * h // 4].reshape(h // 2, w // 2).astype(np.int32)
    v = raw[w * h + w * h // 4:].reshape(h // 2, w // 2).astype(np.int32)
    return y, u, v


def load_rec10(path, w, h, frame=0):
    fsz = w * h * 3 // 2
    raw = np.fromfile(path, dtype='<u2')[frame * fsz:(frame + 1) * fsz]
    y = raw[:w * h].reshape(h, w).astype(np.int32)
    u = raw[w * h:w * h + w * h // 4].reshape(h // 2, w // 2).astype(np.int32)
    v = raw[w * h + w * h // 4:].reshape(h // 2, w // 2).astype(np.int32)
    return y, u, v


@pytest.fixture
def data_dir():
    return DATA
