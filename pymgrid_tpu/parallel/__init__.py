from pymgrid_tpu.parallel.batch import BatchedMicrogrid, make_batch_mesh
from pymgrid_tpu.parallel.batched_env import BatchedContinuousEnv, BatchedDiscreteEnv
from pymgrid_tpu.parallel import distributed

__all__ = ["BatchedMicrogrid", "make_batch_mesh", "BatchedDiscreteEnv", "BatchedContinuousEnv", "distributed"]
