from cmlpl_tpu.models.basenet import (  # noqa: F401
    BaseNet2,
    BaseNet1,
    CCTNet,
    Decoder,
    LinearClassifier,
)
from cmlpl_tpu.models.common import l2_normalize  # noqa: F401
