from datamining_recblr_tpu.unseen.similarity import ItemSimilarity  # noqa: F401
from datamining_recblr_tpu.unseen.features import (  # noqa: F401
    load_item_text_features,
    prepare_item_features,
    synthesize_item_features,
)
