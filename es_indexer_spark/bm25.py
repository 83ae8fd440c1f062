"""BM25 scoring math — the Lucene ``BM25Similarity`` formula the reference
relies on implicitly (it never overrides similarity, so every scored ES
query — e.g. the multi_match at
``indexer/src/test/java/au/org/aodn/esindexer/service/IndexerServiceIT.java:219-238``
— is Lucene BM25 with k1=1.2, b=0.75).

We implement the *non-lossy* variant: float64 everywhere, exact ``dl``
(no 1-byte norm quantization), so the exhaustive oracle and the block-max
pruned engine agree bit-for-bit.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d) = sum_t boost(d) * idf(t) * tfn(t,d)

Tie-break is deterministic: (score desc, doc_ord asc) — doc_ord is the
dense ordinal in stable (conv_id, turn_idx) order, the analogue of
Lucene's internal-docID tie-break.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Lucene BM25 idf; df may be scalar or array (float64)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_norm(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """The idf-free document factor tf/(tf + k1*(1-b+b*dl/avgdl))."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def tf_norm_ceiling(
    max_tf: np.ndarray, min_dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """Upper bound on tf_norm for any posting with tf <= max_tf and
    dl >= min_dl: tf_norm is increasing in tf and decreasing in dl, so
    tf_norm(max_tf, min_dl) dominates the block. This is how block-max
    metadata stays avgdl-free at encode time (avgdl applied here, at
    query time) — the same trick as Lucene's competitive (tf, norm)
    impact pairs."""
    return tf_norm(max_tf, min_dl, avgdl, k1, b)


def topk_desc(scores: np.ndarray, doc_ords: np.ndarray, k: int):
    """Deterministic top-k: (score desc, doc_ord asc). Returns
    (doc_ords, scores) arrays of length <= k."""
    n = len(scores)
    if n == 0:
        return doc_ords[:0], scores[:0]
    k = min(k, n)
    if n > 4 * k:
        # pre-prune: keep every doc scoring >= the kth-largest score
        # (ties at the boundary survive, so rank-identity is preserved)
        kth = np.partition(scores, n - k)[n - k]
        keep = scores >= kth
        scores, doc_ords = scores[keep], doc_ords[keep]
    order = np.lexsort((doc_ords, -scores))[:k]
    return doc_ords[order], scores[order]
