"""Array checkpoints for compiled/batched simulation state.

The host layer's YAML dump/load (reference ``utils/serialize.py``,
``base_module.py:826-957``) checkpoints *one* microgrid object.  The engine's
analog is a pytree of device arrays — per-replica battery charges, genset
counters, PRNG keys, realized forecasts — potentially sharded over a device
mesh.  This module persists such pytrees with orbax, which writes sharded
arrays cooperatively (each host stores its own shards over a multi-host
mesh) and restores them to the same sharding, so checkpoint/resume works
unchanged from one chip to a pod slice.

Resume is exact: restoring a state and continuing a rollout produces the
same trajectory, bitwise, as an uninterrupted run
(tests/test_checkpoint.py).
"""
import os

import numpy as np

__all__ = ["save_state", "restore_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_state(path, state, *, force=True):
    """Persist a state pytree (device or numpy arrays) to ``path``.

    Parameters
    ----------
    path : str or os.PathLike
        Checkpoint directory (created; must be empty unless ``force``).
    state : pytree
        Any pytree of arrays — a :class:`CompiledMicrogrid` state, a
        ``BatchedDiscreteEnv`` batch state, a vectorized-rollout carry.
    force : bool, default True
        Overwrite an existing checkpoint at ``path``.
    """
    path = os.path.abspath(os.fspath(path))
    ckpt = _checkpointer()
    ckpt.save(path, state, force=force)
    ckpt.wait_until_finished()
    ckpt.close()


def restore_state(path, template=None):
    """Restore a state pytree saved by :func:`save_state`.

    Parameters
    ----------
    path : str or os.PathLike
        Checkpoint directory.
    template : pytree or None
        A pytree of arrays (or ShapeDtypeStructs) with the desired
        structure, dtypes and shardings — e.g. the live state being
        replaced, or ``env.reset(seed=0)``.  With a template, arrays are
        restored directly onto its shardings (sharded loads on a mesh);
        without one, the stored structure is returned as host arrays.
    """
    import jax

    path = os.path.abspath(os.fspath(path))
    ckpt = _checkpointer()
    try:
        if template is None:
            return ckpt.restore(path)

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x),
                x.dtype if hasattr(x, "dtype") else np.asarray(x).dtype,
                sharding=getattr(x, "sharding", None),
            ),
            template,
        )
        return ckpt.restore(path, abstract)
    finally:
        ckpt.close()
