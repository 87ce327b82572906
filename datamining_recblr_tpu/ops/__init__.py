from datamining_recblr_tpu.ops.scan import (  # noqa: F401
    linear_scan,
    linear_scan_xla,
    linear_scan_serial,
)
from datamining_recblr_tpu.ops.conv import causal_depthwise_conv  # noqa: F401
