"""Multi-field search: one query scored across several field indexes with
per-field boosts — ES ``multi_match`` proper (the reference queries
``[abstract_phrases^10, ._2gram^5, ._3gram^2]`` in one request,
``IndexerServiceIT.java:219-238``; ``title``/``description`` are likewise
separate Lucene fields of one document).

Each field is its own index over the same corpus (same doc ordinals —
guaranteed by the deterministic ordinal assignment), possibly with a
different analyzer (e.g. ``text`` standard + ``suggest`` shingles). A
multi-field score is the sum over fields of the field's BM25 score times
its boost; per-field top-k is NOT enough (a doc can be mid-rank in every
field yet top overall), so each field contributes its full matching-doc
score vector and the merge happens before the heap."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import bm25
from . import scoring
from .engine import IndexSearcher


class MultiFieldSearcher:
    def __init__(self, fields: list[tuple[IndexSearcher, float]]):
        """fields: (searcher, boost) pairs over the SAME corpus (identical
        doc ordinal space; verified on construction)."""
        if not fields:
            raise ValueError("need at least one field")
        n0 = fields[0][0].n_docs
        for s, _ in fields:
            if s.n_docs != n0:
                raise ValueError("field indexes cover different corpora")
        self.fields = fields

    def search(self, query, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Top-k over the boost-weighted sum of per-field BM25 scores.
        ``mode='and'`` requires every term to match in >=1 field (ES
        cross_fields-style operator=and)."""
        base = self.fields[0][0]
        terms = base.analyze_query(query)
        tid = {t: i for i, t in enumerate(sorted(set(terms)))}
        doc_parts, contrib_parts, pair_parts = [], [], []
        for searcher, boost in self.fields:
            views = searcher._views(terms)
            nm = searcher._load_norms()
            for v in views:  # term-sorted — fixed float summation order
                if v.df == 0:
                    continue
                docs, tfs = v.decode_all()
                contrib = (
                    boost
                    * v.idf
                    * bm25.tf_norm(tfs, nm["dl"][docs].astype(np.float64), searcher.avgdl)
                )
                doc_parts.append(docs)
                contrib_parts.append(contrib)
                if mode == "and":
                    pair_parts.append(docs * len(tid) + tid[v.term])
        if not doc_parts:
            return base._materialize(np.zeros(0, np.int64), np.zeros(0, np.float64))
        all_docs = np.concatenate(doc_parts)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, np.concatenate(contrib_parts))
        if mode == "and":
            # distinct (doc, term) pairs across fields; docs matching every term
            pairs = np.unique(np.concatenate(pair_parts))
            cnt = np.bincount(
                np.searchsorted(uniq, pairs // len(tid)), minlength=len(uniq)
            )
            keep = cnt == len(tid)
            uniq, scores = uniq[keep], scores[keep]
        top_docs, top_scores = bm25.topk_desc(scores, uniq, k)
        return base._materialize(top_docs, top_scores)

    def suggest(self, query: str, k: int = 10) -> pd.DataFrame:
        """SAYT across fields: prefix expansion happens per field against
        that field's own dictionary (shingle fields expand to phrases)."""
        frames = []
        for searcher, boost in self.fields:
            got = searcher.suggest(query, k=max(k * 4, 40), fuzzy=False)
            got = got.assign(score=got["score"] * boost)
            frames.append(got)
        allf = pd.concat(frames, ignore_index=True)
        agg = (
            allf.groupby(["doc_ord", "doc_id", "conv_id", "turn_idx", "role"],
                         as_index=False, sort=False)["score"].sum()
        )
        order = np.lexsort((agg["doc_ord"].to_numpy(), -agg["score"].to_numpy()))[:k]
        return agg.iloc[order].reset_index(drop=True)
