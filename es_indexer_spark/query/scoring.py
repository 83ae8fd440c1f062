"""Top-k BM25 scoring kernels (numpy) over encoded posting chunks.

Two exact strategies, both rank-identical to the brute-force oracle:

- ``exhaustive``: decode every chunk of every query term, score every
  matching doc. The referee path and the fast path for short postings.
- ``blockmax``: block-max pruned scoring. Per-128-posting blocks carry
  (last_doc, max_tf, min_dl) — an avgdl-free impact ceiling (see
  ``bm25.tf_norm_ceiling``). We sweep the doc-ordinal space as elementary
  intervals bounded by block edges, process intervals in descending
  score-ceiling order, and STOP as soon as the best unprocessed interval's
  ceiling can no longer beat the current kth score. Chunks are decoded
  lazily, only when an interval touching them is actually scored — the
  WAND/BMW idea (skip whole blocks of hot terms) re-expressed as a
  vectorized sweep instead of a per-document pointer walk, which is what
  makes it fast in numpy. Exactness: every skipped interval has
  sum-of-ceilings < current theta, and ceilings dominate true scores
  (boost-inclusive), so no top-k doc can be skipped.

The reference delegates all of this to Lucene's WAND/impacts
(``portal_records_index_schema.json`` text fields; scored queries like
``IndexerServiceIT.java:219-238``); we rebuild it because Spark has no
inverted-index primitive.

Public literature the design follows: Broder et al., "Efficient query
evaluation using a two-level retrieval process" (CIKM 2003, WAND);
Ding & Suel, "Faster top-k document retrieval using block-max indexes"
(SIGIR 2011, BMW — our block metadata is exactly their per-block maxima,
impact-ordered as avgdl-free (max_tf, min_dl) pairs like Lucene's
competitive impacts); the vectorized interval sweep follows the
columnar/vectorized-inverted-index direction of ICDE 2025's "Columnar
Formatted Inverted Index" (PAPERS.md) rather than a pointer-walking DAAT
loop, because numpy rewards batch-at-a-time work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import bm25, codec


class TermView:
    """One query term's postings: chunk metadata up-front, lazy decode.

    ``chunks`` is a pandas DataFrame of this term's posting-chunk rows
    sorted by (seg, min_doc) — disjoint, ordered doc ranges (the salted
    skew-split re-assembled by ordered concatenation).
    """

    def __init__(self, term: str, chunks: pd.DataFrame, df: int, n_docs: int,
                 boost: float = 1.0):
        self.term = term
        self.df = int(df)
        self.boost = float(boost)
        # query-time term boost folds into the idf weight (ES ^boost
        # semantics: score contribution = boost * idf * tfn), so block
        # ceilings built from self.idf stay valid boost-inclusive
        self.idf = float(bm25.idf(self.df, n_docs)) * self.boost
        self.chunks = chunks.reset_index(drop=True)
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._all_decoded: tuple[np.ndarray, np.ndarray] | None = None
        self.chunk_min = chunks["min_doc"].to_numpy(np.int64)
        self.chunk_max = chunks["max_doc"].to_numpy(np.int64)

    # ---- block metadata (no decode needed) --------------------------------
    def block_table(self, avgdl: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(start_doc, last_doc, ceiling) per block across all chunks.
        ceiling = idf * tf_norm_ceiling(max_tf, min_dl) — boost applied by
        the caller."""
        if len(self.chunks) == 0:
            z = np.zeros(0, np.int64)
            return z, z, np.zeros(0, np.float64)
        starts, lasts, ceils = [], [], []
        for i in range(len(self.chunks)):
            row = self.chunks.iloc[i]
            last = np.asarray(row["block_last"], dtype=np.int64)
            mtf = np.asarray(row["block_max_tf"], dtype=np.float64)
            mdl = np.asarray(row["block_min_dl"], dtype=np.float64)
            start = np.empty_like(last)
            start[0] = row["min_doc"]
            start[1:] = last[:-1] + 1
            starts.append(start)
            lasts.append(last)
            ceils.append(self.idf * bm25.tf_norm_ceiling(mtf, np.maximum(mdl, 1.0), avgdl))
        return (
            np.concatenate(starts),
            np.concatenate(lasts),
            np.concatenate(ceils),
        )

    # ---- decode ------------------------------------------------------------
    def _decode_chunk(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._decoded.get(i)
        if got is None:
            row = self.chunks.iloc[i]
            gaps = codec.varint_decode(row["doc_bytes"])
            run_lens = np.asarray(row["run_lens"], dtype=np.int64)
            run_starts = np.concatenate(([0], np.cumsum(run_lens)[:-1]))
            docs = codec.delta_decode_multi(gaps, run_starts)
            tfs = codec.varint_decode(row["tf_bytes"]).astype(np.int64)
            got = (docs, tfs)
            self._decoded[i] = got
        return got

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        """All postings of the term in one decode pass: the byte buffers
        of every chunk are joined and decoded with a SINGLE varint call
        (chunk boundaries are run boundaries — each run's first gap is
        absolute, and LEB128 is self-delimiting, so joint decode equals
        per-chunk decode exactly). The per-chunk loop paid ~25 numpy
        passes per chunk; a 50-term suggest expansion touches hundreds of
        chunks per query (guide §1.2)."""
        got = self._all_decoded
        if got is None:
            if len(self.chunks) == 0:
                got = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            else:
                doc_b = self.chunks["doc_bytes"].to_numpy(object)
                tf_b = self.chunks["tf_bytes"].to_numpy(object)
                rl = np.concatenate([
                    np.asarray(x, dtype=np.int64)
                    for x in self.chunks["run_lens"].to_numpy(object)
                ])
                run_starts = np.concatenate(([0], np.cumsum(rl)[:-1]))
                gaps = codec.varint_decode(b"".join(doc_b))
                docs = codec.delta_decode_multi(gaps, run_starts)
                tfs = codec.varint_decode(b"".join(tf_b)).astype(np.int64)
                got = (docs, tfs)
            self._all_decoded = got
        return got

    def gather(self, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
        """Postings with lo <= doc_ord <= hi; decodes only touched chunks."""
        first = int(np.searchsorted(self.chunk_max, lo, side="left"))
        last = int(np.searchsorted(self.chunk_min, hi, side="right"))
        docs_out, tfs_out = [], []
        for i in range(first, last):
            docs, tfs = self._decode_chunk(i)
            a = int(np.searchsorted(docs, lo, side="left"))
            b = int(np.searchsorted(docs, hi, side="right"))
            if b > a:
                docs_out.append(docs[a:b])
                tfs_out.append(tfs[a:b])
        if not docs_out:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return np.concatenate(docs_out), np.concatenate(tfs_out)

    def positions_for(self, want_docs: np.ndarray) -> dict[int, np.ndarray]:
        """doc_ord -> positions array (requires with_positions index)."""
        out: dict[int, np.ndarray] = {}
        for i in range(len(self.chunks)):
            row = self.chunks.iloc[i]
            buf = row.get("pos_bytes")
            if buf is None:
                raise ValueError("index was built without positions")
            docs, _ = self._decode_chunk(i)
            mask = np.isin(docs, want_docs)
            if not mask.any():
                continue
            plists = codec.decode_positions(buf, len(docs))
            for j in np.flatnonzero(mask):
                out[int(docs[j])] = plists[j]
        return out


def _score_gathered(
    views: list[TermView],
    gathered: list[tuple[np.ndarray, np.ndarray]],
    dl_of: np.ndarray,
    dl_base: int,
    avgdl: float,
    boost_of: np.ndarray | None,
    mode: str,
    deleted: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-score the union of gathered postings (one (docs, tfs) pair per
    term, term order = sorted — fixed float64 summation order).
    ``dl_of[doc_ord - dl_base]`` is the doc length. Returns (doc_ords,
    scores) for docs matching the boolean mode."""
    all_docs = np.concatenate([g[0] for g in gathered])
    if len(all_docs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    # one flat vectorized pass + a single bincount instead of per-term
    # np.add.at loops: add.at is an order of magnitude slower than
    # bincount's sequential accumulate, and both add contributions in
    # the same term-major array order, so float64 sums are bit-identical
    # (50-term suggest expansions spent ~2/3 of their latency here —
    # guide §1.2 per-task work)
    all_tfs = np.concatenate([g[1] for g in gathered]).astype(np.float64)
    lens = [len(g[0]) for g in gathered]
    idf_flat = np.repeat(
        np.asarray([v.idf for v in views], dtype=np.float64), lens
    )
    all_dl = dl_of[all_docs - dl_base].astype(np.float64)
    contrib = idf_flat * bm25.tf_norm(all_tfs, all_dl, avgdl)
    scores = np.bincount(inv, weights=contrib, minlength=len(uniq))
    if mode == "and":
        counts = np.bincount(inv, minlength=len(uniq))
        keep = counts == len(views)
        uniq, scores = uniq[keep], scores[keep]
    if deleted is not None and len(deleted) and len(uniq):
        # tombstoned docs (streaming delete/upsert) never enter the heap
        keep = ~np.isin(uniq, deleted, assume_unique=False)
        uniq, scores = uniq[keep], scores[keep]
    if boost_of is not None and len(uniq):
        scores = scores * boost_of[uniq - dl_base]
    return uniq, scores


def exhaustive_topk(
    views: list[TermView],
    dl_of: np.ndarray,
    avgdl: float,
    k: int,
    *,
    dl_base: int = 0,
    boost_of: np.ndarray | None = None,
    mode: str = "or",
    deleted: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    views = sorted(views, key=lambda v: v.term)
    if mode == "and" and any(v.df == 0 for v in views):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    views = [v for v in views if v.df > 0]
    if not views:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    gathered = [v.decode_all() for v in views]
    docs, scores = _score_gathered(
        views, gathered, dl_of, dl_base, avgdl, boost_of, mode, deleted
    )
    return bm25.topk_desc(scores, docs, k)


def blockmax_topk(
    views: list[TermView],
    dl_of: np.ndarray,
    avgdl: float,
    k: int,
    *,
    dl_base: int = 0,
    boost_of: np.ndarray | None = None,
    max_boost: float = 1.0,
    mode: str = "or",
    deleted: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned exact top-k (see module docstring)."""
    views = sorted(views, key=lambda v: v.term)
    if mode == "and" and any(v.df == 0 for v in views):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    views = [v for v in views if v.df > 0]
    if not views:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    # ---- elementary intervals from block edges -----------------------------
    tables = [v.block_table(avgdl) for v in views]
    edges = np.unique(
        np.concatenate(
            [t[0] for t in tables] + [t[1] + 1 for t in tables]
        )
    )
    n_iv = len(edges) - 1
    if n_iv <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    iv_lo = edges[:-1]
    iv_hi = edges[1:] - 1  # inclusive
    ub = np.zeros(n_iv, dtype=np.float64)
    covered = np.zeros(n_iv, dtype=np.int64)
    for starts, lasts, ceils in tables:
        if len(lasts) == 0:
            continue  # term absent from this doc range (e.g. this segment)
        # block containing iv_lo: the first block with last >= iv_lo
        bi = np.searchsorted(lasts, iv_lo, side="left")
        ok = (bi < len(lasts)) & (starts[np.minimum(bi, len(lasts) - 1)] <= iv_lo)
        bi = np.minimum(bi, len(lasts) - 1)
        ub += np.where(ok, ceils[bi], 0.0)
        covered += ok
    ub *= max_boost
    if mode == "and":
        ub = np.where(covered == len(views), ub, 0.0)

    order = np.argsort(-ub, kind="stable")
    order = order[ub[order] > 0.0]  # zero-ceiling intervals hold no postings
    top_docs = np.zeros(0, np.int64)
    top_scores = np.zeros(0, np.float64)
    theta = -np.inf
    # geometric batching: score 8, 16, 32... intervals per Python iteration.
    # Exactness is unchanged (scoring extra intervals never removes a doc);
    # the batch boundary check keeps the early exit: stop when the best
    # unscored interval's ceiling is strictly below theta.
    pos, batch = 0, 8
    while pos < len(order):
        if len(top_scores) >= k and ub[order[pos]] < theta:
            break  # exact early exit (strict <: theta-ties must be scored)
        take = order[pos : pos + batch]
        pos += len(take)
        batch = min(batch * 2, 4096)
        # gather each term once over the union of the taken intervals
        gathered_parts = [[] for _ in views]
        for idx in take:
            lo, hi = int(iv_lo[idx]), int(iv_hi[idx])
            for vi, v in enumerate(views):
                g = v.gather(lo, hi)
                if len(g[0]):
                    gathered_parts[vi].append(g)
        gathered = [
            (
                np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64),
                np.concatenate([p[1] for p in parts]) if parts else np.zeros(0, np.int64),
            )
            for parts in gathered_parts
        ]
        docs, scores = _score_gathered(
            views, gathered, dl_of, dl_base, avgdl, boost_of, mode, deleted
        )
        if len(docs) == 0:
            continue
        top_docs = np.concatenate([top_docs, docs])
        top_scores = np.concatenate([top_scores, scores])
        top_docs, top_scores = bm25.topk_desc(top_scores, top_docs, k)
        if len(top_scores) >= k:
            theta = top_scores[-1]
    return top_docs, top_scores


def phrase_docs(views: list[TermView], mode_docs: np.ndarray) -> np.ndarray:
    """Docs (subset of mode_docs = AND-intersection) where the terms occur
    adjacently in order — match_phrase (``GeoNetworkServiceImpl.java:118``,
    used inside bool.filter, i.e. unscored)."""
    if not views:
        return np.zeros(0, np.int64)
    pos_maps = [v.positions_for(mode_docs) for v in views]
    hits = []
    for d in mode_docs:
        cand = pos_maps[0].get(int(d))
        if cand is None:
            continue
        ok = True
        for i in range(1, len(views)):
            nxt = pos_maps[i].get(int(d))
            if nxt is None:
                ok = False
                break
            cand = cand[np.isin(cand + i, nxt)]
            if len(cand) == 0:
                ok = False
                break
        if ok and len(cand):
            hits.append(int(d))
    return np.array(hits, dtype=np.int64)
