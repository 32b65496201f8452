"""multiz_tpu — a TPU-native multiple-genome aligner (multiz/TBA capabilities).

A from-scratch JAX/XLA/Pallas re-design of the multiz/TBA toolkit
(Blanchette et al. 2004): progressive "align two alignments" multiple
alignment over a phylogenetic guide tree, with the banded column DP executed
as batched device kernels and the MAF algebra as a vectorized host layer.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the packed Pallas programs cost
# minutes to compile per bucket shape over the axon tunnel; caching
# them on disk makes every later process (tests, bench, pipelines)
# start hot. Opt out with MULTIZ_TPU_NO_COMPILE_CACHE=1; an explicit
# JAX_COMPILATION_CACHE_DIR wins.
if not _os.environ.get("MULTIZ_TPU_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "multiz_tpu_jax"
        ),
    )
    # cache every program, even fast-compiling ones
    _os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2"
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    import sys as _sys

    if "jax" in _sys.modules:  # env was read already; set via config
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
        _jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(_os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
        )
