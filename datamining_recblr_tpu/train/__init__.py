from datamining_recblr_tpu.train.trainer import Trainer  # noqa: F401
