from tomobar_tpu.models.direct import RecToolsDIR, RecToolsDIRTPU
from tomobar_tpu.models.iterative import RecToolsIRTPU

__all__ = ["RecToolsDIR", "RecToolsDIRTPU", "RecToolsIRTPU"]
