from pymgrid_tpu.algos.priority_list import PriorityListAlgo, PriorityListElement
from pymgrid_tpu.algos.rbc import RuleBasedControl

__all__ = ["PriorityListAlgo", "PriorityListElement", "RuleBasedControl"]


def __getattr__(name):
    if name == "ModelPredictiveControl":
        from pymgrid_tpu.algos.mpc import ModelPredictiveControl

        return ModelPredictiveControl
    if name == "BatchedMPC":
        from pymgrid_tpu.algos.mpc_jax import BatchedMPC

        return BatchedMPC
    if name == "BatchedSAA":
        from pymgrid_tpu.algos.saa_jax import BatchedSAA

        return BatchedSAA
    if name == "SuiteMPC":
        from pymgrid_tpu.algos.mpc_suite import SuiteMPC

        return SuiteMPC
    if name == "SampleAverageApproximation":
        from pymgrid_tpu.algos.saa import SampleAverageApproximation

        return SampleAverageApproximation
    if name == "NonModularRuleBasedControl":
        from pymgrid_tpu.algos.nonmodular_rbc import NonModularRuleBasedControl

        return NonModularRuleBasedControl
    if name in ("Benchmarks", "ControlOutput", "HorizonOutput"):
        from pymgrid_tpu.algos import control

        return getattr(control, name)
    raise AttributeError(name)
