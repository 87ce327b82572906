"""Content-based item similarity for unseen-item preprocessing.

Parity with the reference's pipeline (reference
``run_with_unseen.py:133-193``): TF-IDF over item text descriptions ->
TruncatedSVD to ``n_components`` -> cosine similarity of *all* items
against the training-vocabulary ("valid") items; unseen items map to
their most-similar valid item.  sklearn runs host-side (one-time
preprocessing, not a TPU path)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class ItemSimilarity:
    def __init__(
        self,
        item_features: pd.DataFrame,
        valid_tokens: list[str],
        n_components: int = 16,
        seed: int = 42,
    ):
        from scipy.sparse import csr_matrix
        from sklearn.decomposition import TruncatedSVD
        from sklearn.feature_extraction.text import TfidfVectorizer
        from sklearn.metrics.pairwise import cosine_similarity

        feats = item_features.sort_values("item_id").reset_index(drop=True)
        self.item_index = {t: i for i, t in enumerate(feats["item_id"])}

        vect = TfidfVectorizer()
        tfidf = csr_matrix(vect.fit_transform(feats["description"]))
        n_components = min(n_components, tfidf.shape[1] - 1, len(feats) - 1)
        n_components = max(n_components, 1)
        svd = TruncatedSVD(n_components=n_components, n_iter=3, random_state=seed)
        x = svd.fit_transform(tfidf)

        self.valid_tokens = [t for t in valid_tokens if t in self.item_index]
        valid_rows = [self.item_index[t] for t in self.valid_tokens]
        # [n_items, n_valid] similarity (reference :165)
        self.sim = cosine_similarity(x, x[valid_rows])
        self._cache: dict[str, str] = {}

    def nearest_valid(self, token: str) -> str | None:
        """Most-similar training-vocab item for an arbitrary item token;
        None when the token has no feature row."""
        if token in self._cache:
            return self._cache[token]
        row = self.item_index.get(token)
        if row is None or not self.valid_tokens:
            return None
        best = self.valid_tokens[int(np.argmax(self.sim[row]))]
        self._cache[token] = best
        return best

    def map_sequence(self, tokens: list[str], valid_set: set[str]) -> list[str]:
        """Map each unseen token to its nearest valid item (reference
        ``to_valid_list``, run_with_unseen.py:174-191); tokens without
        features are dropped."""
        out = []
        for t in tokens:
            if t in valid_set:
                out.append(t)
            else:
                m = self.nearest_valid(t)
                if m is not None:
                    out.append(m)
        return out
