from pymgrid_tpu.core import physics
from pymgrid_tpu.core.numpy_sum import numpy_sum_compat

__all__ = ["physics", "numpy_sum_compat"]


def __getattr__(name):
    # jax-dependent pieces load lazily so the host layer works without jax
    if name in ("extract_spec", "MicrogridSpec", "ModuleRef"):
        from pymgrid_tpu.core import spec

        return getattr(spec, name)
    if name in ("make_step_fn", "make_reset_fn", "StepOutput"):
        from pymgrid_tpu.core import engine

        return getattr(engine, name)
    if name == "CompiledMicrogrid":
        from pymgrid_tpu.core.compiled import CompiledMicrogrid

        return CompiledMicrogrid
    raise AttributeError(name)
