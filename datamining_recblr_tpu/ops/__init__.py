from datamining_recblr_tpu.ops.scan import (  # noqa: F401
    linear_scan,
    linear_scan_xla,
    linear_scan_serial,
)
from datamining_recblr_tpu.ops.conv import causal_depthwise_conv  # noqa: F401
from datamining_recblr_tpu.ops.attention import fused_attention  # noqa: F401
from datamining_recblr_tpu.ops.embedding import embedding_lookup  # noqa: F401
from datamining_recblr_tpu.ops.fused_bdlru import fused_bdlru  # noqa: F401
from datamining_recblr_tpu.ops.fused_layer import fused_recurrent_layer  # noqa: F401
from datamining_recblr_tpu.ops.topk import sharded_topk, topk_scores  # noqa: F401
