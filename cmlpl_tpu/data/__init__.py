from cmlpl_tpu.data.io import load_scene, synthetic_scene  # noqa: F401
from cmlpl_tpu.data.prep import (  # noqa: F401
    feature_normalize,
    pca_norm,
    prepare_scene,
    PreparedScene,
)
from cmlpl_tpu.data.patches import (  # noqa: F401
    pad_symmetric,
    patch_pad_width,
    gather_patches,
)
from cmlpl_tpu.data.splits import (generate_splits, load_splits,  # noqa: F401
                                   Splits)
from cmlpl_tpu.data.pipeline import SemiSupervisedSampler  # noqa: F401
