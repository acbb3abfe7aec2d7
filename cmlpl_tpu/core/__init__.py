from cmlpl_tpu.core.mesh import (  # noqa: F401
    create_mesh,
    create_mesh_2d,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from cmlpl_tpu.core.rng import seed_everything  # noqa: F401
from cmlpl_tpu.core.init import (  # noqa: F401
    torch_conv_kernel_init,
    torch_linear_kernel_init,
    torch_bias_init,
)
