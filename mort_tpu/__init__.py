"""mort-tpu: a TPU-native differentiable path tracer.

A from-scratch JAX/Pallas rebuild of the capabilities of the reference CUDA
renderer ``mort`` (Ray Tracing in One Weekend GPU port): sphere/quad
primitives, BVH, five materials, four textures, emissive lights with
mixture-PDF importance sampling — as a stream-compacted wavefront loop that
is differentiable end-to-end and shards rays across TPU meshes.
"""

import os as _os

# Persistent XLA compilation cache: tunneled-TPU compiles are slow (minutes);
# cached executables make repeat renders start instantly.  Opt out with
# MORT_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("MORT_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("MORT_TPU_COMPILE_CACHE",
                            _os.path.expanduser("~/.cache/mort_tpu_xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .camera import Camera, make_camera
from .rng import DEFAULT_SEED
from .scene.build import SceneData, SceneMeta, World
from .render.renderer import render, to_u8, to_u8_np

__version__ = "0.1.0"

__all__ = [
    "Camera", "make_camera", "DEFAULT_SEED",
    "SceneData", "SceneMeta", "World",
    "render", "to_u8", "to_u8_np",
]
