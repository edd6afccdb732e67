"""Platform forcing that works on axon-plugin hosts.

The real TPU on this class of host registers as the `axon` PJRT plugin
(its sitecustomize sets jax_platforms="axon,cpu"); the standard `tpu`
backend would try to initialize a local libtpu and fail. So a user
request for "tpu" maps to the axon backend when that plugin is
registered (CLAUDE.md rule 1: the env var is ignored, only
jax.config.update works, and it must run before backends latch).
"""

from __future__ import annotations


def force_platform(name: str) -> None:
    """jax.config.update('jax_platforms', ...) with axon mapping."""
    import jax

    if name in ("tpu", "axon"):
        try:
            from jax._src import xla_bridge

            if "axon" in xla_bridge._backend_factories:
                name = "axon,cpu"
        except (ImportError, AttributeError):
            pass  # plain libtpu host: keep the requested name
    jax.config.update("jax_platforms", name)
