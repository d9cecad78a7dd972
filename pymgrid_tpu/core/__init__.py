from pymgrid_tpu.core import physics

__all__ = ["physics"]
