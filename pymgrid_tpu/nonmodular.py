"""Legacy non-modular microgrid (placeholder).

The reference's ``NonModularMicrogrid`` (``_deprecated/non_modular_microgrid.py``)
is the DataFrame-record substrate that the pymgrid25 suite was generated on
and that MPC/SAA's legacy paths consume.  The full implementation lands with
the generator/conversion layer; this placeholder keeps isinstance dispatch
working in the env constructors.
"""

__all__ = ["NonModularMicrogrid"]


class NonModularMicrogrid:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "NonModularMicrogrid is not yet implemented in pymgrid_tpu; use the "
            "modular Microgrid API."
        )
