from pymgrid_tpu.convert.convert import to_modular, to_nonmodular

__all__ = ["to_modular", "to_nonmodular"]
