from datamining_recblr_tpu.data.atomic import read_atomic_file  # noqa: F401
from datamining_recblr_tpu.data.dataset import (  # noqa: F401
    SeqData,
    SplitArrays,
    build_dataset,
)
from datamining_recblr_tpu.data.batching import batch_count, iter_batches  # noqa: F401
from datamining_recblr_tpu.data.synthetic import (  # noqa: F401
    generate_synthetic_interactions,
    write_synthetic_inter,
)
