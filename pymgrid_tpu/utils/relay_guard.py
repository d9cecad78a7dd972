"""Pre-flight guards for the known TPU-relay worker-kill mode.

Measured boundary (round 5, ``tools/relay_probe.py``; one probe per fresh
client process, crash = "TPU worker process crashed or restarted" plus a
~3-minute relay wedge):

| workload                      | single execution    | result |
|---|---|---|
| f64 engine scan, B=1024       | 8759 steps (0.85 s) | ok     |
| f64 solver-in-loop (SuiteMPC) | 500 steps (~30-60s) | ok     |
| f64 solver-in-loop            | 1000 steps (~2x)    | CRASH  |
| f64 solver-in-loop            | 1500 steps          | CRASH  |
| f32 solver-in-loop            | 4000 steps (7.5 s)  | ok     |

So the killer is neither float64 per se (r3 folklore — a full f64
engine-year runs in under a second) nor raw step count: it is the
*duration* of one device execution, with the crash appearing between the
~30-60 s of a 500-step f64 solver segment and its 1000-step double.  The
thresholds below keep each solver execution in the measured-safe region
with the solver's per-step cost folded in; plain engine scans have no
observed limit and are not guarded.
"""
import numpy as np

__all__ = ["check_relay_scan"]

# measured-safe single-execution step counts for solver-in-the-loop scans
_SOLVER_CHUNK_LIMIT = {np.dtype(np.float64): 500, np.dtype(np.float32): 4000}


def check_relay_scan(dtype, n_steps, chunk, platform=None):
    """Raise with guidance when a chunked solver-in-the-loop device scan
    (BatchedMPC / BatchedSAA / SuiteMPC ``run_scanned``) is known to kill
    the relayed TPU worker.

    ``platform`` defaults to the runtime backend; pass it explicitly in
    tests.
    """
    if platform is None:
        import jax

        platform = jax.devices()[0].platform
    if platform == "cpu":
        return

    # chunk=None means "run all n_steps in ONE device execution" for every
    # caller — exactly the oversized-execution mode this guard catches.
    eff_chunk = n_steps if chunk is None else chunk
    limit = _SOLVER_CHUNK_LIMIT.get(np.dtype(dtype), 500)
    if eff_chunk is not None and eff_chunk > limit:
        raise RuntimeError(
            f"solver-in-the-loop scan chunk {eff_chunk} at {np.dtype(dtype)} "
            f"exceeds the measured-safe single-execution limit of {limit} "
            f"steps: the relay kills device executions beyond roughly a "
            f"minute (tools/relay_probe.py capture, docs/relay_probes.md), "
            f"surfacing as 'TPU worker crashed or restarted' plus a ~3 min "
            f"wedge for the next client.  Pass chunk <= {limit}."
        )
