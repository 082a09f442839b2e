"""Test configuration: run the suite on a virtual 8-device CPU mesh with
float64 enabled, so multi-chip sharding and solver-oracle comparisons can
run without TPU hardware (SURVEY.md section 4 strategy (b)).

Note: this environment's sitecustomize registers a remote-TPU ("axon")
backend and force-sets ``jax_platforms='axon,cpu'`` at interpreter startup,
overriding the JAX_PLATFORMS env var — so we must override it back via
jax.config *after* importing jax.  Otherwise the suite claims the single
TPU chip and serialises/hangs behind other sessions.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
