from cmlpl_tpu.models.basenet import (  # noqa: F401
    BaseNet2,
    BaseNet1,
    CCTNet,
    Decoder,
    LinearClassifier,
)
from cmlpl_tpu.models.common import l2_normalize  # noqa: F401
from cmlpl_tpu.models.attention import CAMModule, PAMModule  # noqa: F401
from cmlpl_tpu.models.ssftt import SSFTTnet, ViTTransformer  # noqa: F401
from cmlpl_tpu.models.dbda import DBDA, DBDAFeature  # noqa: F401
from cmlpl_tpu.models.ssrn import SSRN  # noqa: F401
from cmlpl_tpu.models.fdssc import FDSSC  # noqa: F401
from cmlpl_tpu.models.msvit import MultiScaleViT, mish  # noqa: F401
from cmlpl_tpu.models.zoo import (  # noqa: F401
    ZOO,
    BaseNet2Zoo,
    build_model,
    spa_randomization,
    spe_randomization,
    weight_ema,
)
