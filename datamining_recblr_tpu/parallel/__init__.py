from datamining_recblr_tpu.parallel.mesh import make_mesh  # noqa: F401
from datamining_recblr_tpu.parallel.sharding import (  # noqa: F401
    batch_pspec,
    param_pspecs,
    shard_batch,
    shard_params,
)
from datamining_recblr_tpu.parallel.steps import (  # noqa: F401
    make_sharded_eval_step,
    make_sharded_train_step,
)
