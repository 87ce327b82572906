from datamining_recblr_tpu.utils.logging import MetricsLogger, init_logger  # noqa: F401
