from nbody_tpu.utils.timing import device_time, fetch_scalar
from nbody_tpu.utils.profiling import trace_profile
from nbody_tpu.utils.debug import checked_accelerations, assert_finite_state

__all__ = [
    "device_time",
    "fetch_scalar",
    "trace_profile",
    "checked_accelerations",
    "assert_finite_state",
]
