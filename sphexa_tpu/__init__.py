"""sphexa_tpu: TPU-native SPH framework (SPH-EXA re-architecture)."""

import os as _os

# Persistent XLA compile cache: the Pallas pair kernels take minutes to
# compile over the remote-compile tunnel; cache them across processes.
if _os.environ.get("SPHEXA_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.path.expanduser("~/.cache/sphexa-jax"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
