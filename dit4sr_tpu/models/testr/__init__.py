from dit4sr_tpu.models.testr.model import TESTR, TESTROutput  # noqa: F401
from dit4sr_tpu.models.testr.detector import TextSpotter  # noqa: F401
