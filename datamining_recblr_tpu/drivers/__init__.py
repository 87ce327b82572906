from datamining_recblr_tpu.drivers.experiment import run_experiment  # noqa: F401
