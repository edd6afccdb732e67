"""Example-runner shim: force the CPU platform (the environment's TPU
plugin overrides JAX_PLATFORMS via jax.config) then exec the example."""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")
runpy.run_path(sys.argv[1], run_name="__main__")
