"""Test configuration: force a LOCAL CPU JAX platform with 8 virtual
devices (the standard JAX fake-multi-device pattern, SURVEY.md §4.5).

This image boots every Python process with a remote-TPU PJRT plugin
("axon") via a PYTHONPATH sitecustomize, and JAX_PLATFORMS=axon in the
ambient env; jax is already imported (and its config snapshotted) before
conftest runs.  With that backend registered, compilation and even
lowering round-trip through the remote tunnel (~60x slower), so tests
must (a) flip the platform via jax.config and (b) deregister the axon
backend factory before any backend is initialized."""

import os

# Backend init (lazy) reads XLA_FLAGS from the environment, so this can
# still be set here even though jax itself is already imported.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: movegen/env graphs take seconds to
# compile; caching speeds up repeated sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - jax internals moved
    pass

assert jax.devices()[0].platform == "cpu"
