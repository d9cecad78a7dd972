"""Worker for the real 2-process ``jax.distributed`` test.

Launched twice by ``tests/test_multiprocess.py`` with
``JAX_PLATFORMS=cpu`` and 2 virtual devices per process (4 global).
Exercises the multi-process branches of
:mod:`pymgrid_tpu.parallel.distributed` — ``from_process_local`` (via
``jax.make_array_from_process_local_data``) and ``fetch`` (via
``process_allgather``) — plus a cross-host reduction under jit.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from pymgrid_tpu.parallel import distributed as dist

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = dist.global_batch_mesh()
    assert dist.local_batch_size(4) == 2

    local_rows = np.arange(4.0).reshape(2, 2) + 10.0 * process_id
    global_tree = dist.from_process_local(mesh, {"x": local_rows})
    assert global_tree["x"].shape == (4, 2)

    total = jax.jit(lambda t: jnp.sum(t["x"]))(global_tree)

    fetched = dist.fetch(global_tree["x"])
    expected = np.concatenate(
        [np.arange(4.0).reshape(2, 2), np.arange(4.0).reshape(2, 2) + 10.0]
    )
    np.testing.assert_array_equal(fetched, expected)
    assert float(total) == expected.sum()

    print(f"proc {process_id} OK total={float(total)}", flush=True)


if __name__ == "__main__":
    main()
