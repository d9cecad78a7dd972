"""Pre-flight guards for known TPU-relay worker-kill modes.

Two program classes reproducibly crash the axon-relayed TPU worker instead
of failing cleanly (r3 finding, CLAUDE.md): float64 year-scans (kernel
fault) and oversized single executions (the relay kills device executions
beyond ~2 minutes, surfacing as "TPU worker crashed or restarted" plus a
~3-minute wedge for the next client).  These checks turn both into
actionable errors *before* any device execution is dispatched.
"""
import numpy as np

__all__ = ["check_relay_scan"]


def check_relay_scan(dtype, n_steps, chunk, platform=None):
    """Raise with guidance when a chunked device scan is known to kill the
    relayed TPU worker.

    ``platform`` defaults to the runtime backend; pass it explicitly in
    tests.
    """
    if platform is None:
        import jax

        platform = jax.devices()[0].platform
    if platform == "cpu":
        return

    if np.dtype(dtype) == np.float64 and n_steps > 1000:
        raise RuntimeError(
            f"float64 scans of {n_steps} steps reproducibly crash the "
            f"relayed TPU worker (kernel fault; ~3 min relay wedge).  Run "
            f"float64 tables on CPU, use float32 on chip "
            f"(matmul_precision='float32' preserves quality — see "
            f"RESULTS_CHIP.md), or probe f64 with n_steps <= 1000."
        )
    # chunk=None means "run all n_steps in ONE device execution" for every
    # caller (BatchedMPC/BatchedSAA/SuiteMPC run_scanned) — exactly the
    # oversized-execution mode this guard exists to catch.
    eff_chunk = n_steps if chunk is None else chunk
    if eff_chunk is not None and eff_chunk > 4000:
        raise RuntimeError(
            f"scan chunk {eff_chunk} risks a single device execution beyond "
            f"the relay's ~2-minute kill threshold (surfaces as 'TPU "
            f"worker crashed or restarted').  Use chunk <= 4000 for plain "
            f"engine scans and chunk <= 500 for solver-in-the-loop scans."
        )
