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
score vector and the merge happens before the heap.

``bool_prefix`` reproduces the reference's flagship suggest request
end-to-end: ``multi_match`` type ``bool_prefix`` with ``fuzziness: AUTO``
(IndexerServiceIT.java:219-238) — every token but the last fuzzy-expanded
against each field's own dictionary, the last token prefix-expanded, and
suggest-analyzed fields applying the 10/5/2 shingle-tier boosts (the
``abstract_phrases^10 / _2gram^5 / _3gram^2`` sub-field weights, tiered by
the width of the matched shingle)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import bm25
from ..analysis import tokenize_py
from .engine import IndexSearcher

# the reference's sub-field boosts: base^10, _2gram^5, _3gram^2
TIER_BOOSTS = (10.0, 5.0, 2.0)


def _tier_boosts(terms: list[str], boosts=TIER_BOOSTS) -> dict[str, float]:
    b1, b2, b3 = boosts
    return {
        t: (b1 if t.count(" ") == 0 else b2 if t.count(" ") == 1 else b3)
        for t in terms
    }


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

    # ------------------------------------------------------------- internals
    def _sum_fields(
        self,
        specs: list[tuple[IndexSearcher, float, list[str], dict[str, float] | None]],
        k: int,
        mode: str = "or",
        all_terms: list[str] | None = None,
    ) -> pd.DataFrame:
        """Exact merge: every (field, terms) spec contributes its FULL
        matching-doc score vector (field boost × term boost × BM25), summed
        per doc before the single global heap."""
        base = self.fields[0][0]
        tid = {t: i for i, t in enumerate(sorted(set(all_terms or [])))} or None
        doc_parts, contrib_parts, pair_parts = [], [], []
        for searcher, fboost, terms, term_boosts in specs:
            views = searcher._views(terms, term_boosts=term_boosts)
            nm = searcher._load_norms()
            for v in views:  # term-sorted — fixed float summation order
                if v.df == 0:
                    continue
                docs, tfs = v.decode_all()
                contrib = (
                    fboost
                    * v.idf  # idf already carries the per-term boost
                    * bm25.tf_norm(tfs, nm["dl"][docs].astype(np.float64), searcher.avgdl)
                )
                doc_parts.append(docs)
                contrib_parts.append(contrib)
                if mode == "and" and tid is not None and v.term in tid:
                    pair_parts.append(docs * len(tid) + tid[v.term])
        if not doc_parts:
            return base._materialize(np.zeros(0, np.int64), np.zeros(0, np.float64))
        all_docs = np.concatenate(doc_parts)
        uniq, inv = np.unique(all_docs, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, np.concatenate(contrib_parts))
        if mode == "and" and tid is not None:
            # distinct (doc, term) pairs across fields; docs matching every term
            pairs = np.unique(np.concatenate(pair_parts)) if pair_parts else np.zeros(0, np.int64)
            cnt = np.bincount(
                np.searchsorted(uniq, pairs // len(tid)), minlength=len(uniq)
            )
            keep = cnt == len(tid)
            uniq, scores = uniq[keep], scores[keep]
        top_docs, top_scores = bm25.topk_desc(scores, uniq, k)
        return base._materialize(top_docs, top_scores)

    # ---------------------------------------------------------------- public
    def search(self, query, k: int = 10, mode: str = "or") -> pd.DataFrame:
        """Top-k over the boost-weighted sum of per-field BM25 scores.
        ``mode='and'`` requires every term to match in >=1 field (ES
        cross_fields-style operator=and)."""
        base = self.fields[0][0]
        terms = base.analyze_query(query)
        specs = [(s, b, terms, None) for s, b in self.fields]
        return self._sum_fields(specs, k, mode=mode, all_terms=terms)

    def bool_prefix(
        self,
        query: str,
        k: int = 10,
        *,
        fuzzy: bool = True,
        tier_boosts: tuple[float, float, float] = TIER_BOOSTS,
    ) -> pd.DataFrame:
        """The reference's exact suggest request
        (IndexerServiceIT.java:219-238): ``multi_match`` type
        ``bool_prefix``, ``fuzziness: AUTO`` — per field, all tokens but
        the last fuzzy-AUTO-expanded against THAT field's dictionary, the
        last token prefix-expanded (shingle fields expand to phrases), and
        suggest-analyzed fields weighted base^10/_2gram^5/_3gram^2 by the
        matched shingle's width. Exact global merge (full per-field score
        vectors, one heap)."""
        toks = tokenize_py(query)
        base = self.fields[0][0]
        if not toks:
            return base._materialize(np.zeros(0, np.int64), np.zeros(0, np.float64))
        specs = []
        for searcher, fboost in self.fields:
            terms: list[str] = []
            for t in toks[:-1]:
                terms.extend(searcher.expand_fuzzy(t) if fuzzy else [t])
            terms.extend(searcher.expand_prefix(toks[-1]) or [toks[-1]])
            terms = list(dict.fromkeys(terms))
            tb = (
                _tier_boosts(terms, tier_boosts)
                if searcher.manifest.get("analyzer") == "suggest"
                else None
            )
            specs.append((searcher, fboost, terms, tb))
        return self._sum_fields(specs, k)

    def suggest(self, query: str, k: int = 10, *, fuzzy: bool = True) -> pd.DataFrame:
        """SAYT across fields — alias for ``bool_prefix`` (kept for API
        continuity with ``IndexSearcher.suggest``)."""
        return self.bool_prefix(query, k, fuzzy=fuzzy)

    # ------------------------------------------------------ distributed path
    def bool_prefix_df(
        self,
        query: str,
        k: int = 10,
        *,
        fuzzy: bool = True,
        tier_boosts: tuple[float, float, float] = TIER_BOOSTS,
    ):
        """``bool_prefix`` distributed end to end: expansions come from
        Spark filters over each field's term_stats, every field emits its
        FULL per-segment score vector (``IndexSearcher.scores_df``), and
        the cross-field sum + top-k is plain DataFrame algebra — no
        O(corpus|dictionary) driver state, any number of fields.

        Scores can differ from the driver path by float re-association
        (per-field partials summed by the aggregate instead of one fixed
        interleave) — ranks identical except exact-tie permutations."""
        from functools import reduce

        from pyspark.sql import functions as F

        base = self.fields[0][0]
        toks = tokenize_py(query)
        if not toks:
            return base.search_df([], k)
        parts = []
        for searcher, fboost in self.fields:
            terms: list[str] = []
            for t in toks[:-1]:
                terms.extend(searcher.expand_fuzzy_df(t) if fuzzy else [t])
            terms.extend(searcher.expand_prefix_df(toks[-1]) or [toks[-1]])
            terms = list(dict.fromkeys(terms))
            tb = (
                _tier_boosts(terms, tier_boosts)
                if searcher.manifest.get("analyzer") == "suggest"
                else None
            )
            parts.append(
                searcher.scores_df(terms, term_boosts=tb)
                .withColumn("score", F.col("score") * fboost)
            )
        agg = (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("doc_ord")
            .agg(F.sum("score").alias("score"))
        )
        top = agg.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
        return top.join(
            base.doc_stats_df().select(
                "doc_ord", "doc_id", "conv_id", "turn_idx", "role"
            ),
            "doc_ord",
        ).select(
            "doc_ord", "doc_id", "conv_id", "turn_idx", "role", "score"
        ).orderBy(F.desc("score"), F.asc("doc_ord"))
