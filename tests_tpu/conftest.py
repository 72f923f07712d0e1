"""Real-TPU test tier.

Unlike ``tests/`` (which pins a virtual 8-device CPU mesh), this directory
runs on the DEFAULT backend — the real chip when the axon tunnel is up — and
skips itself otherwise. It exists because Mosaic lowering only happens on
real hardware: interpret-mode parity (tests/test_kernels.py) cannot catch a
TPU-only divergence in the hand-rolled kernels.

Run manually (never concurrently with another TPU process):

    python -m pytest tests_tpu/ -q

First compiles go through the remote compile service (30-120 s/shape).
"""

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires the real TPU backend; skipped elsewhere"
    )


@pytest.fixture(scope="session")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("real TPU backend unavailable (default backend is "
                    f"{jax.default_backend()!r})")
    return jax.default_backend()
