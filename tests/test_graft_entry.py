"""The driver entry points must always compile and run.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual n-device CPU mesh; this test runs both
on the test suite's 8-virtual-device mesh so a broken entry can't ship.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_steps():
    import jax

    fn, args = graft.entry()
    new_state, out = jax.jit(fn)(*args)
    assert np.isfinite(float(out.reward))
    assert int(new_state["step"]) == int(args[1]["step"]) + 1


def test_dryrun_multichip_virtual_mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    graft.dryrun_multichip(8)
