from tomobar_tpu.solvers.core import (
    admm,
    cgls,
    fista,
    landweber,
    osem,
    power_method,
    sirt,
)

__all__ = ["power_method", "landweber", "sirt", "cgls", "fista", "admm", "osem"]
