"""Exhaustive brute-force BM25 oracle — the rank-identity referee.

The reference's scorer is Lucene inside Elasticsearch (never overridden →
BM25 k1=1.2 b=0.75; exercised by e.g.
``indexer/src/test/java/au/org/aodn/esindexer/service/IndexerServiceIT.java:219-238``).
We cannot run ES here, so per SURVEY §2.6 the *reference scorer* is defined
as exhaustive float64 scoring of the exact Lucene formula over every
matching document, with deterministic (score desc, doc_ord asc) tie-break.
The indexed engine (exhaustive-over-index and block-max pruned paths in
``query/``) must be rank-identical — docIDs AND scores — to this oracle.

This module never touches the index: it tokenizes the raw corpus with the
same analyzer and scores from first principles, so any index-side bug
(codec, block metadata, pruning) shows up as a diff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bm25
from .analysis import tokenize_series


class CorpusOracle:
    """Holds a fully materialized small corpus (tests / sf<=0.1) and
    answers top-k queries by brute force."""

    def __init__(self, pdf: pd.DataFrame, text_col: str = "text",
                 analyzer: str = "index"):
        """pdf must be sorted by doc_ord and contain doc_ord, doc_id,
        text (+ optional role/tool for boosts)."""
        from .analysis import suggest_tokens_series

        self.pdf = pdf.reset_index(drop=True)
        toks = (
            tokenize_series(pdf[text_col])
            if analyzer == "index"
            else suggest_tokens_series(pdf[text_col])
        )
        self.tokens = toks
        self.dl = toks.map(len).to_numpy(np.float64)
        self.n_docs = len(pdf)
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0
        self.doc_ords = pdf["doc_ord"].to_numpy(np.int64)
        # per-doc term->tf maps and global df
        self.tf_maps: list[dict[str, int]] = []
        df_counter: dict[str, int] = {}
        for lst in toks:
            m: dict[str, int] = {}
            for t in lst:
                m[t] = m.get(t, 0) + 1
            self.tf_maps.append(m)
            for t in m:
                df_counter[t] = df_counter.get(t, 0) + 1
        self.df = df_counter

    def _doc_boosts(self, role_boosts, tool_boosts) -> np.ndarray:
        boost = np.ones(self.n_docs, dtype=np.float64)
        if role_boosts:
            boost *= (
                self.pdf["role"].map(lambda r: role_boosts.get(r, 1.0)).to_numpy(np.float64)
            )
        if tool_boosts:
            boost *= (
                self.pdf["tool"]
                .map(lambda t: tool_boosts.get(t, 1.0) if t is not None else 1.0)
                .to_numpy(np.float64)
            )
        return boost

    def score_all(
        self,
        terms: list[str],
        role_boosts: dict[str, float] | None = None,
        tool_boosts: dict[str, float] | None = None,
        mode: str = "or",
        term_boosts: dict[str, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Score every matching doc. Terms are summed in sorted order
        (fixed float summation order — rank-identity requirement).
        Returns (doc_ords, scores) for docs matching the boolean mode."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        nmatch = np.zeros(self.n_docs, dtype=np.int64)
        uniq = sorted(set(terms))
        term_boosts = term_boosts or {}
        for t in uniq:
            dft = self.df.get(t, 0)
            if dft == 0:
                continue
            w = bm25.idf(dft, self.n_docs) * term_boosts.get(t, 1.0)
            tf = np.array([m.get(t, 0) for m in self.tf_maps], dtype=np.float64)
            has = tf > 0
            scores[has] += w * bm25.tf_norm(tf[has], self.dl[has], self.avgdl)
            nmatch += has
        if mode == "and":
            need = sum(1 for t in uniq if self.df.get(t, 0) > 0)
            # an AND with a zero-df term matches nothing (Lucene semantics)
            if need < len(uniq):
                mask = np.zeros(self.n_docs, dtype=bool)
            else:
                mask = nmatch == need
        else:
            mask = nmatch > 0
        scores = scores * self._doc_boosts(role_boosts, tool_boosts)
        return self.doc_ords[mask], scores[mask]

    def topk(
        self,
        terms: list[str],
        k: int = 10,
        role_boosts: dict[str, float] | None = None,
        tool_boosts: dict[str, float] | None = None,
        mode: str = "or",
        term_boosts: dict[str, float] | None = None,
    ) -> pd.DataFrame:
        ords, scores = self.score_all(terms, role_boosts, tool_boosts, mode, term_boosts)
        top_ords, top_scores = bm25.topk_desc(scores, ords, k)
        idx = np.searchsorted(self.doc_ords, top_ords)
        out = self.pdf.iloc[idx][["doc_ord", "doc_id"]].copy()
        out["score"] = top_scores
        return out.reset_index(drop=True)

    def phrase_match(self, terms: list[str]) -> np.ndarray:
        """doc_ords where terms appear adjacently in order (match_phrase,
        ``GeoNetworkServiceImpl.java:118``). Brute force over token lists."""
        hits = []
        n = len(terms)
        for i, lst in enumerate(self.tokens):
            L = len(lst)
            for j in range(L - n + 1):
                if lst[j : j + n] == terms:
                    hits.append(self.doc_ords[i])
                    break
        return np.array(hits, dtype=np.int64)


def oracle_from_spark(df, text_col: str = "text", analyzer: str = "index") -> CorpusOracle:
    """Collect a (small) Spark transcript DataFrame with doc_ord/doc_id
    into a driver-side oracle."""
    cols = [c for c in ("doc_ord", "doc_id", "role", "tool", text_col) if c in df.columns]
    return CorpusOracle(df.select(*cols).orderBy("doc_ord").toPandas(), text_col, analyzer)
