from datamining_recblr_tpu.models.base import get_model  # noqa: F401
