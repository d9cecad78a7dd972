from pymgrid_tpu.parallel.batch import BatchedMicrogrid, make_batch_mesh
from pymgrid_tpu.parallel.batched_env import BatchedDiscreteEnv

__all__ = ["BatchedMicrogrid", "make_batch_mesh", "BatchedDiscreteEnv"]
