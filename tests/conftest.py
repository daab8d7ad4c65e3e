"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware.  Must run before jax is imported anywhere."""

import os

# Force CPU: the session pre-sets JAX_PLATFORMS=axon (tunneled real TPU) and
# sitecustomize.py re-registers axon via jax.config at interpreter start, so
# neither the env var nor setdefault works — we must override through
# jax.config BEFORE any backend initializes.  Tests always run on the
# virtual 8-device CPU mesh; only bench.py talks to the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the limb-plane kernels compose into large XLA
# programs; caching makes repeated test runs start fast.
if not os.environ.get("ZIKKURAT_NO_CACHE"):
    from zikkurat_algebra_tpu.utils.cache import setup_cache

    setup_cache(jax)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x5EED)
