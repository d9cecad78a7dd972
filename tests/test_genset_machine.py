"""Exhaustive genset state-machine parity.

The genset ON/OFF machine is the most bug-prone kernel (the reference devotes
three test files to it).  Here the branchless transition in
``pymgrid_tpu.core.physics`` is validated exhaustively against the genuine
reference implementation over every reachable state/action combination.
"""
import itertools

import numpy as np
import pytest

from pymgrid_tpu.core import physics

from helpers.reference import reference_available, import_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _ref_genset(start_up_time, wind_down_time, allow_abortion, init_start_up):
    import_reference()
    import warnings
    from pymgrid.modules import GensetModule

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return GensetModule(
            running_min_production=10,
            running_max_production=50,
            genset_cost=0.5,
            start_up_time=start_up_time,
            wind_down_time=wind_down_time,
            allow_abortion=allow_abortion,
            init_start_up=init_start_up,
        )


def _set_state(genset, cur, goal, up, down):
    genset._current_status = cur
    genset._goal_status = goal
    genset._steps_until_up = up
    genset._steps_until_down = down


def _valid_state(cur, goal, up, down, sut, wdt):
    """States reachable by the reference machine."""
    if up < 0 or down < 0 or up > sut or down > wdt:
        return False
    if cur == goal:
        # equilibrium: the inactive counter is reset
        return (up == 0) if cur else (down == 0)
    # change in progress: active counter must be positive (the machine
    # completes a change as soon as its counter hits zero)
    return (up > 0) if goal else (down > 0)


@pytest.mark.parametrize("allow_abortion", [True, False])
def test_exhaustive_status_machine(allow_abortion):
    checked = 0
    for sut, wdt in itertools.product(range(4), range(4)):
        genset = _ref_genset(sut, wdt, allow_abortion, True)
        for cur, goal, g in itertools.product((0, 1), (0, 1), (0, 1)):
            for up, down in itertools.product(range(sut + 1), range(wdt + 1)):
                if not _valid_state(cur, goal, up, down, sut, wdt):
                    continue
                _set_state(genset, cur, goal, up, down)
                try:
                    genset.update_status(float(g))
                    expected = (
                        genset._current_status,
                        genset._goal_status,
                        genset._steps_until_up,
                        genset._steps_until_down,
                    )
                except (ValueError, AssertionError, RuntimeError) as e:
                    # reference rejects this transition; ours must have
                    # identical semantics only on accepted transitions
                    continue

                got = physics.genset_update_status(
                    cur, goal, up, down, g, sut, wdt, allow_abortion
                )
                got = tuple(int(x) for x in got)
                assert got == expected, (
                    f"sut={sut} wdt={wdt} abort={allow_abortion} "
                    f"state=({cur},{goal},{up},{down}) g={g}: "
                    f"expected {expected}, got {got}"
                )
                checked += 1
    assert checked > 100


@pytest.mark.parametrize("allow_abortion", [True, False])
def test_exhaustive_next_status(allow_abortion):
    for sut, wdt in itertools.product(range(3), range(3)):
        genset = _ref_genset(sut, wdt, allow_abortion, True)
        for cur, goal, g in itertools.product((0, 1), (0, 1), (0, 1)):
            for up, down in itertools.product(range(sut + 1), range(wdt + 1)):
                if not _valid_state(cur, goal, up, down, sut, wdt):
                    continue
                _set_state(genset, cur, goal, up, down)
                expected = genset.next_status(g)
                got = int(physics.genset_next_status(cur, up, down, g))
                assert got == expected


def test_sequenced_trajectories_match_reference():
    """Random goal sequences through both machines stay in lockstep."""
    rng = np.random.RandomState(0)
    from pymgrid_tpu.modules import GensetModule as OurGenset
    import warnings

    for trial in range(20):
        sut, wdt = rng.randint(0, 4), rng.randint(0, 4)
        abort = bool(rng.randint(2))
        init = bool(rng.randint(2))
        ref = _ref_genset(sut, wdt, abort, init)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ours = OurGenset(
                running_min_production=10,
                running_max_production=50,
                genset_cost=0.5,
                start_up_time=sut,
                wind_down_time=wdt,
                allow_abortion=abort,
                init_start_up=init,
            )
        for _ in range(50):
            g = float(rng.rand())
            ref.update_status(g)
            ours.update_status(g)
            assert ours._state_dict() == {
                "current_status": ref._current_status,
                "goal_status": ref._goal_status,
                "steps_until_up": ref._steps_until_up,
                "steps_until_down": ref._steps_until_down,
            }


def test_branchless_works_vectorized():
    """The same transition runs on arrays (engine usage)."""
    cur = np.array([0, 1, 1, 0])
    goal = np.array([0, 1, 0, 1])
    up = np.array([2, 0, 0, 1])
    down = np.array([0, 1, 1, 0])
    g = np.array([1, 0, 0, 1])
    out = physics.genset_update_status(cur, goal, up, down, g, 2, 1, True)
    assert all(o.shape == (4,) for o in out)
