"""Ray compatibility decorator (reference ``src/pymgrid/utils/ray.py``).

Ray can hand back read-only arrays; retry the call on copies when an
assignment to one is attempted.
"""
import functools
from copy import copy

__all__ = ["ray_decorator"]


def ray_decorator(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except ValueError as e:
            if "assignment destination is read-only" not in e.args[0]:
                raise
            return func(
                *(copy(a) for a in args), **{k: copy(v) for k, v in kwargs.items()}
            )

    return wrapper
