"""pymgrid_tpu: a TPU-native microgrid simulation engine.

Drop-in API mirror of Total-RD/pymgrid (host layer) plus a compiled
JAX/XLA engine (:mod:`pymgrid_tpu.core`) that batches thousands of microgrids
stepping in lockstep on TPU, sharded over device meshes
(:mod:`pymgrid_tpu.parallel`).
"""
from pymgrid_tpu.version import __version__
from pymgrid_tpu.paths import PROJECT_PATH
from pymgrid_tpu.microgrid import Microgrid, DEFAULT_HORIZON

__all__ = ["Microgrid", "DEFAULT_HORIZON", "PROJECT_PATH", "__version__"]


def __getattr__(name):
    # Lazy imports keep `import pymgrid_tpu` light and avoid cycles.
    if name == "envs":
        from pymgrid_tpu import envs

        return envs
    if name == "MicrogridGenerator":
        from pymgrid_tpu.generator import MicrogridGenerator

        return MicrogridGenerator
    if name == "NonModularMicrogrid":
        from pymgrid_tpu.nonmodular import NonModularMicrogrid

        return NonModularMicrogrid
    raise AttributeError(f"module 'pymgrid_tpu' has no attribute {name!r}")
