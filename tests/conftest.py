"""Test harness: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (survey §4 implication list).
Must set env vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session may preset a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may have pre-imported jax and initialized a TPU backend
# (sitecustomize). Re-select CPU so the suite runs on the virtual 8-device
# host mesh regardless.
jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu" or jax.device_count() < 8:
    try:
        from jax._src import xla_bridge as _xb

        _xb.backends.cache_clear() if hasattr(_xb.backends, "cache_clear") else None
        if hasattr(_xb, "_clear_backends"):
            _xb._clear_backends()
        else:  # pragma: no cover - version drift fallback
            import jax.extend.backend as _jeb

            _jeb.clear_backends()
    except Exception:  # pragma: no cover
        pass
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
