from flashattn_tpu.utils.failure import (
    RecoveryEvent,
    StepTimer,
    TrainingFailure,
    check_finite,
    probe_collectives,
    resilient_train,
)
from flashattn_tpu.utils.verify import VerifyReport, verify_results

__all__ = [
    "verify_results",
    "VerifyReport",
    "TrainingFailure",
    "StepTimer",
    "RecoveryEvent",
    "check_finite",
    "probe_collectives",
    "resilient_train",
]
