"""Test configuration: run everything on CPU with 8 virtual devices so all
sharding/collective paths are exercised without TPU hardware (SURVEY.md §4.4).

Set ``RT_TESTS_TPU=1`` to keep the real TPU backend instead — the
on-hardware tier (tests/test_tpu_smoke.py) only runs then:

    RT_TESTS_TPU=1 python -m pytest tests/test_tpu_smoke.py -q

Note: this environment pins JAX_PLATFORMS=axon through sitecustomize, so the
platform switch must go through jax.config, and XLA_FLAGS must be set before
the CPU backend is first initialized.
"""
import os

if os.environ.get("RT_TESTS_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
