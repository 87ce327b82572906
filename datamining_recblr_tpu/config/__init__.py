from datamining_recblr_tpu.config.config import Config  # noqa: F401
