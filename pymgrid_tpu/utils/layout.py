"""TPU layout helpers for episode-stacked scan outputs.

A ``lax.scan`` that stacks per-step observation/log rows writes each step
with a dynamic-update-slice into the episode buffer.  Two measured TPU
pathologies make that write dominate a whole rollout:

* a non-tile-aligned minor (feature) dimension costs ~4x per store;
* XLA's layout assignment may pick a *feature-major* layout for the buffer,
  turning each step's write into ``d`` strided partial stores (~3x the
  entire rollout, measured on chip).

``pad_lanes`` + ``constrain_row_major`` fix both: pad the feature dim to a
multiple of the 128-lane tile inside the loop, pin the stacked buffer to
row-major, and slice the padding off once outside the loop.
"""

__all__ = ["pad_lanes", "constrain_row_major", "constrain_time_major",
           "constrain_axis_major"]


def constrain_axis_major(x, axis):
    """Pin ``x`` to a layout with ``axis`` most-major (remaining axes in
    row-major order).

    Use on the OUTPUT of a many-operand stack/concatenate whose new axis
    would otherwise be minor: the engine builds obs/log rows by stacking
    ~330 per-field (cfg, B) arrays, and a feature-minor concatenate writes
    every field with stride ``d`` (measured 3.5 ms/step on chip, 80% of a
    collect rollout); feature-major makes it ``d`` contiguous block
    copies.  No-op on CPU.
    """
    import jax

    if jax.devices()[0].platform == "cpu":
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    order = (axis,) + tuple(i for i in range(x.ndim) if i != axis)
    return with_layout_constraint(x, Layout(major_to_minor=order))


def pad_lanes(x, lanes=128):
    """Zero-pad the last (feature) dim of ``x`` to a multiple of ``lanes``."""
    import jax.numpy as jnp

    d = x.shape[-1]
    rem = (-d) % lanes
    if rem == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, rem)])


def constrain_row_major(x):
    """Pin ``x`` (typically a stacked scan output) to row-major layout.

    No-op on CPU, where layout constraints are unsupported and the default
    layout is already row-major.
    """
    import jax

    if jax.devices()[0].platform == "cpu":
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    return with_layout_constraint(
        x, Layout(major_to_minor=tuple(range(x.ndim)))
    )


def constrain_time_major(x, time_axis):
    """Pin a stacked scan output to a layout with the TIME axis most-major.

    Each scan step writes the full ``x[..., t, ...]`` slab; making ``t``
    the most-major physical axis keeps that write one contiguous store
    regardless of where batch axes sit (e.g. the suite's
    ``(configs, B, T, d)`` buffers, where plain row-major would stride the
    write over every batch element).  No-op on CPU.
    """
    import jax

    if jax.devices()[0].platform == "cpu":
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    order = (time_axis,) + tuple(i for i in range(x.ndim) if i != time_axis)
    return with_layout_constraint(x, Layout(major_to_minor=order))
