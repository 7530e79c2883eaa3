"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective code paths are validated without TPU hardware by
forcing the host platform and splitting it into 8 virtual devices
(SURVEY.md section 4, item e). x64 is enabled so Taylor-remainder tests
can resolve O(eps^2) remainders; TPU production runs use f32 (the axon
TPU rejects f64 kernels) with compensated accumulation where it matters.
"""

import os

# The harness exports JAX_PLATFORMS=axon (TPU tunnel); tests must run on
# the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite compiles hundreds of sizeable
# f64 executables; warm reruns skip them (separate dir from the TPU
# cache so CPU/TPU entries never share eviction pressure).
from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.environ.get("SMO_JAX_CACHE_CPU",
                                       "/tmp/smo_jax_cache_cpu"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
