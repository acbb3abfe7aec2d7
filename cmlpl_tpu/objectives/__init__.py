from cmlpl_tpu.objectives.queue import (  # noqa: F401
    QueueState,
    queue_init,
    queue_update,
    memory_smooth,
)
from cmlpl_tpu.objectives.cmlpl import (  # noqa: F401
    adaptive_threshold,
    soft_consistency,
    pseudo_label_graph,
    graph_contrastive,
)
from cmlpl_tpu.objectives.supervised import (  # noqa: F401
    cross_entropy,
    reverse_cross_entropy,
    entropy_filtered_ce,
    ohem_cross_entropy,
)
from cmlpl_tpu.objectives.cct import softmax_js_loss  # noqa: F401
from cmlpl_tpu.objectives.cps import cps_cross_supervision  # noqa: F401
from cmlpl_tpu.objectives.contrastive import (  # noqa: F401
    nt_xent,
    memobank_contrastive,
    MemoBankState,
    memobank_init,
)
from cmlpl_tpu.objectives.mmd import distribution_loss, mmd_loss  # noqa: F401
from cmlpl_tpu.objectives.criterion import (  # noqa: F401
    get_criterion,
    weighted_cross_entropy,
)
