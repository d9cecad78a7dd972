"""Hand-written TPU kernels (Pallas)."""


def __getattr__(name):
    if name in ("make_pallas_rbc_rollout", "supported_spec"):
        from pymgrid_tpu.ops import pallas_rollout

        return getattr(pallas_rollout, name)
    raise AttributeError(name)
