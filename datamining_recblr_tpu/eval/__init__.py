from datamining_recblr_tpu.eval.metrics import rank_metrics, target_ranks  # noqa: F401
from datamining_recblr_tpu.eval.evaluator import Evaluator  # noqa: F401
