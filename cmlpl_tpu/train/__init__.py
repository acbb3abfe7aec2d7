from cmlpl_tpu.train.state import CMLPLConfig, CMLPLTrainState, NetState  # noqa: F401
from cmlpl_tpu.train.cmlpl import CMLPLTrainer  # noqa: F401
from cmlpl_tpu.train.cps import CPSTrainer  # noqa: F401
from cmlpl_tpu.train.cct import CCTTrainer  # noqa: F401
