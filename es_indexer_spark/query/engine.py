"""IndexSearcher — the retrieval surface of the engine.

Re-expresses the reference's query operators (SURVEY §2.6) over the
parquet index that ``index.build`` writes:

- Q1/Q2  ``ids``/``term`` exact lookup          → ``get`` / doc_stats filter
- Q3     ``match_phrase``                        → positional postings + adjacency
- Q4     ``match_all + sort + search_after``     → ``scan_after`` keyset pagination
- Q5     ``match`` with synonym expansion        → broadcast SynonymSet → OR
- Q6     ``multi_match bool_prefix`` + fuzziness → ``suggest`` (prefix + fuzzy
         expansion against the term dictionary, per-term boosts)
- Q7     count-only                              → ``count``
- Q8     top-k BM25                              → ``search`` (block-max pruned,
         exhaustive referee path), deterministic (score desc, doc_ord asc)
- Q9     ``_analyze``                            → ``analysis.analyze``

Two execution paths with FULL feature parity (pytest rank-identity):

- **driver path** (default below ``driver_max_docs``): posting chunks for
  the query terms are read straight through pyarrow.dataset with
  partition (tbucket) + row-group (term — files are term-sorted)
  pruning, no Spark job — millisecond latency, the analogue of ES
  answering a query from one coordinating node. Valid while per-corpus
  norms fit the driver.
- **distributed path** (``search_df`` / ``count_df`` /
  ``phrase_search_df`` / ``suggest_df`` / ``scores_df``): posting rows
  for the query terms are cogrouped with doc_stats by segment; each Spark
  task runs the same numpy kernel over its segment (= shard) and emits a
  local top-k; a global sort of the tiny union gathers the final top-k —
  Lucene's shard fan-out/merge mapped 1:1 onto Spark partitions. Synonym
  expansion, term/role/tool boosts, phrase adjacency, counts and suggest
  expansions (pruned Spark filters over term_stats) all run here with NO
  O(corpus) or O(dictionary) driver state, so every operator exists at
  10^9+ docs. The public ``search``/``count``/``phrase_search``/
  ``suggest`` auto-dispatch between paths on corpus size.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import SynonymSet, tokenize_py
from ..index import catalog
from ..index.build import term_bucket
from . import scoring

codec_BLOCK = 128  # codec.BLOCK_SIZE — auto-strategy postings threshold

_POSTING_COLS = [
    "term", "seg", "min_doc", "max_doc", "df_chunk",
    "doc_bytes", "tf_bytes", "block_last", "block_max_tf", "block_min_dl",
    "run_lens",
]
_POS_COL = "pos_bytes"  # present only when the index was built with positions


class SnapshotExpiredError(RuntimeError):
    """The searcher's term-dictionary snapshot was expired by later appends.

    Postings/doc_stats snapshots stay valid indefinitely (appends only ADD
    batch directories), but append_batch retains only the current and
    previous term-stats dictionary (Iceberg snapshot-expiry style), so a
    searcher older than one append horizon loses its dictionary files.
    Without this guard the failure surfaced as a raw FileNotFoundException
    from a lazily-executed scan (review finding). Call ``refresh()`` (or
    open a new IndexSearcher) to continue."""


def levenshtein_within(q: str, cands: np.ndarray, dmax: int) -> np.ndarray:
    """Vectorized Levenshtein <= dmax for MANY candidates at once: the DP
    advances one query character per iteration with all candidates and all
    positions as numpy lanes; the insertion recurrence cur[j] =
    min(cur[j], cur[j-1]+1) is the classic running-min-of-(cur - j) scan,
    so nothing is per-candidate Python."""
    n = len(cands)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(c) for c in cands), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    M = np.zeros((n, maxlen), dtype=np.uint32)
    for i, c in enumerate(cands):  # one-time packing, not the DP loop
        M[i, : len(c)] = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
    qa = np.frombuffer(q.encode("utf-32-le"), dtype=np.uint32)
    j_idx = np.arange(maxlen + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (n, maxlen + 1)).astype(np.int32).copy()
    for i in range(1, len(qa) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (M != qa[i - 1])
        cur[:, 1:] = np.minimum(prev[:, 1:] + 1, sub)
        # propagate insertions left-to-right in one accumulate
        t = np.minimum.accumulate(cur - j_idx, axis=1)
        cur = t + j_idx
        prev = cur
    return prev[np.arange(n), lens] <= dmax


def auto_fuzziness(term: str) -> int:
    """ES ``fuzziness: AUTO`` (exercised at IndexerServiceIT.java:228):
    edit distance 0 for <3 chars, 1 for 3-5, 2 for >=6."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str, version_dir: str | None = None):
        self.spark = spark
        self.index_dir = index_dir
        vdir = version_dir or catalog.current_version_dir(index_dir)
        if vdir is None:
            raise FileNotFoundError(f"no published index version in {index_dir}")
        self.vdir = vdir
        self.manifest = catalog.read_json(os.path.join(vdir, "manifest.json"))
        self.n_docs = int(self.manifest["n_docs"])
        # ordinal span: one past the highest ordinal ever allocated. Equal
        # to n_docs until an expunging merge (index/merge.py) removes
        # tombstoned docs WITHOUT renumbering — ordinals then have holes,
        # and every dense doc_ord-indexed array must size by span, not by
        # the live-row count. Holes are never referenced: expunged docs
        # appear in no posting list and no doc_stats row.
        self.ord_span = int(self.manifest.get("next_ord", self.manifest["n_docs"]))
        self.avgdl = float(self.manifest["avgdl"])
        self.n_buckets = int(self.manifest["n_buckets"])
        self.term_stats_path = os.path.join(
            vdir, self.manifest.get("term_stats_dir", "term_stats")
        )
        self._postings_ds = pads.dataset(
            os.path.join(vdir, "postings"), partitioning="hive", format="parquet"
        )
        self._doc_ds = pads.dataset(
            os.path.join(vdir, "doc_stats"), partitioning="hive", format="parquet"
        )
        self._norms: dict | None = None
        import uuid as _uuid

        self._snapshot_token = _uuid.uuid4().hex  # see _doc_side
        self._term_dict: pd.DataFrame | None = None
        self._chunk_cache: dict[str, pd.DataFrame] = {}
        self._df_cache: dict[str, int] = {}
        self._doc_side_df: DataFrame | None = None
        # Spark-side source DataFrames are opened ONCE per searcher (the
        # analogue of Lucene's long-lived segment readers): re-calling
        # spark.read.parquet per query re-lists the index's files and
        # re-reads footers — ~40% of warm distributed-query latency at
        # 500k docs, and unbounded listing cost on a 10^5-file index.
        # SNAPSHOT CONTRACT (Lucene point-in-time reader semantics): a
        # searcher sees the version AS OF OPEN. Appends only ADD files
        # (new batch dirs) and write a fresh versioned term_stats dir —
        # nothing a cached file index references is replaced in place.
        # Postings/doc_stats snapshots stay valid indefinitely (appends
        # only ADD batch dirs); the term dictionary is retained for the
        # current + previous append (older copies are expired,
        # Iceberg-snapshot style), so refresh() within one append — or
        # open a new searcher — to stay inside the retention horizon.
        # Compaction publishes a whole new version dir.
        # built EAGERLY so the snapshot is taken at open — a lazy first
        # use would list files at whatever later moment the source is
        # first touched, splicing a mid-append state into a searcher
        # whose stats/tombstones are as-of-open (review finding)
        self._postings_src: DataFrame = self.spark.read.parquet(
            os.path.join(vdir, "postings")
        )
        self._doc_stats_src: DataFrame = self.spark.read.parquet(
            os.path.join(vdir, "doc_stats")
        )
        self._term_stats_src: DataFrame = self.spark.read.parquet(
            self.term_stats_path
        )
        # corpora larger than this auto-dispatch search/count/phrase/suggest
        # to the distributed path (driver path holds O(corpus) norms)
        self.driver_max_docs = int(os.environ.get("ES_IDX_DRIVER_MAX_DOCS", 20_000_000))
        self.synonyms = SynonymSet()
        from ..streaming.incremental import load_tombstones

        self.tombstones = load_tombstones(vdir)  # deleted doc_ords (sorted)

    # ------------------------------------------------------------------ IO
    def _posting_cols(self) -> list[str]:
        cols = list(_POSTING_COLS)
        if self.manifest.get("with_positions"):
            cols.append(_POS_COL)
        return cols

    _CACHE_MAX_TERMS = 4096

    def _postings_map(self, terms: list[str]) -> dict[str, pd.DataFrame]:
        """Posting chunks PER TERM, via a per-term LRU cache (the
        posting-list cache every IR engine keeps hot — repeated/hot query
        terms skip the parquet read entirely). Misses are fetched in one
        pruned pyarrow scan. Returning the per-term frames directly lets
        ``_views`` skip the old concat-then-remask round trip (one
        boolean scan of the concatenated frame per term per query)."""
        uniq = list(dict.fromkeys(terms))
        missing = [t for t in uniq if t not in self._chunk_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.n_buckets) for t in missing})
            filt = pc.field("tbucket").isin(buckets) & pc.field("term").isin(missing)
            pdf = self._postings_ds.to_table(
                columns=self._posting_cols(), filter=filt
            ).to_pandas()
            pdf = pdf.sort_values(["term", "seg", "min_doc"]).reset_index(drop=True)
            grouped = {t: g for t, g in pdf.groupby("term", sort=False)}
            for t in missing:
                self._chunk_cache[t] = grouped.get(t, pdf.iloc[0:0])
        out = {}
        for t in uniq:
            got = self._chunk_cache.pop(t)  # re-insert → LRU recency order
            self._chunk_cache[t] = got
            out[t] = got
        # evict only AFTER the current query's terms were touched — evicting
        # first could drop a hit term of this very query (KeyError) once the
        # cache is full in a long-lived searcher
        while len(self._chunk_cache) > self._CACHE_MAX_TERMS:
            self._chunk_cache.pop(next(iter(self._chunk_cache)))
        return out

    def _postings_pdf(self, terms: list[str]) -> pd.DataFrame:
        """Concatenated posting chunks for the terms (see _postings_map)."""
        got = self._postings_map(terms)
        parts = [g for g in got.values() if len(g)]
        if not parts:
            return next(iter(got.values())) if got else pd.DataFrame()
        return pd.concat(parts, ignore_index=True)

    def _load_norms(self) -> dict:
        """Dense doc_ord-indexed arrays (dl, role, tool, conv_id, turn_idx).
        Driver-path only; the distributed path streams these per segment."""
        if self._norms is None:
            tbl = self._doc_ds.to_table(
                columns=["doc_ord", "dl", "role", "tool", "conv_id", "turn_idx", "doc_id"]
            )
            pdf = tbl.to_pandas().sort_values("doc_ord").reset_index(drop=True)
            if len(pdf) == self.ord_span:
                # dense ordinal space: position == doc_ord, no scatter
                self._norms = {
                    "dl": pdf["dl"].to_numpy(np.int64),
                    "role": pdf["role"].to_numpy(object),
                    "tool": pdf["tool"].to_numpy(object),
                    "doc_id": pdf["doc_id"].to_numpy(object),
                    "conv_id": pdf["conv_id"].to_numpy(object),
                    "turn_idx": pdf["turn_idx"].to_numpy(np.int64),
                    "live": None,
                }
            else:
                # expunged holes (index/merge.py): scatter each column by
                # doc_ord into span-sized arrays so position == doc_ord
                # stays true; holes carry nulls/zeros and are excluded by
                # the live mask (postings never reference them anyway)
                span = self.ord_span
                ords = pdf["doc_ord"].to_numpy(np.int64)
                live = np.zeros(span, dtype=bool)
                live[ords] = True
                nm: dict = {"live": live}
                for col, dtype, fill in (
                    ("dl", np.int64, 0),
                    ("turn_idx", np.int64, -1),
                ):
                    a = np.full(span, fill, dtype=dtype)
                    a[ords] = pdf[col].to_numpy(dtype)
                    nm[col] = a
                for col in ("role", "tool", "doc_id", "conv_id"):
                    a = np.full(span, None, dtype=object)
                    a[ords] = pdf[col].to_numpy(object)
                    nm[col] = a
                self._norms = nm
        return self._norms

    def term_dictionary(self) -> pd.DataFrame:
        if self._term_dict is None:
            self._check_dictionary_snapshot()
            self._term_dict = (
                pads.dataset(self.term_stats_path, format="parquet")
                .to_table(columns=["term", "df", "total_tf"])
                .to_pandas()
                .sort_values("term")
                .reset_index(drop=True)
            )
        return self._term_dict

    def _views(
        self,
        terms: list[str],
        pdf: pd.DataFrame | None = None,
        term_boosts: dict[str, float] | None = None,
    ) -> list[scoring.TermView]:
        tb = term_boosts or {}
        if pdf is not None:
            by_term = {t: pdf[pdf["term"] == t] for t in sorted(set(terms))}
        else:
            by_term = self._postings_map(sorted(set(terms)))
        views = []
        for t in sorted(set(terms)):
            chunks = by_term[t]
            views.append(
                scoring.TermView(
                    t, chunks, int(chunks["df_chunk"].sum()), self.n_docs,
                    boost=tb.get(t, 1.0),
                )
            )
        return views

    def _boost_arrays(self, role_boosts, tool_boosts):
        if not role_boosts and not tool_boosts:
            return None, 1.0
        nm = self._load_norms()
        boost = np.ones(self.ord_span, dtype=np.float64)
        if role_boosts:
            for r, w in role_boosts.items():
                boost[nm["role"] == r] *= w
        if tool_boosts:
            for t, w in tool_boosts.items():
                boost[nm["tool"] == t] *= w
        return boost, float(boost.max()) if len(boost) else 1.0

    def _materialize(self, doc_ords: np.ndarray, scores: np.ndarray) -> pd.DataFrame:
        nm = self._load_norms()
        return pd.DataFrame(
            {
                "doc_ord": doc_ords,
                "doc_id": nm["doc_id"][doc_ords],
                "conv_id": nm["conv_id"][doc_ords],
                "turn_idx": nm["turn_idx"][doc_ords],
                "role": nm["role"][doc_ords],
                "score": scores,
            }
        )

    # --------------------------------------------------------------- query
    def analyze_query(self, query: str | list[str], expand_synonyms: bool = False) -> list[str]:
        terms = tokenize_py(query) if isinstance(query, str) else list(query)
        if expand_synonyms and self.synonyms.mapping:
            terms = [w for g in self.synonyms.expand(terms) for w in g]
        # dedupe, keep deterministic order
        return list(dict.fromkeys(terms))

    def search(
        self,
        query: str | list[str],
        k: int = 10,
        *,
        mode: str = "or",
        strategy: str = "auto",
        role_boosts: dict[str, float] | None = None,
        tool_boosts: dict[str, float] | None = None,
        term_boosts: dict[str, float] | None = None,
        expand_synonyms: bool = False,
    ) -> pd.DataFrame:
        """Driver-path top-k BM25. Returns (doc_ord, doc_id, conv_id,
        turn_idx, role, score) sorted (score desc, doc_ord asc).
        ``term_boosts`` carries ES ^boost weights (e.g. per-field /
        per-expansion-group multipliers) folded into each term's idf.

        ``strategy="auto"`` picks block-max pruning for few-term queries
        over long postings (where skipping pays) and exhaustive scoring
        for many-term expansions or short postings (where the sweep's
        bookkeeping costs more than scoring everything) — the same
        query-shape dispatch Lucene applies to WAND. Both are exact.

        Above ``driver_max_docs`` the query auto-dispatches to the
        distributed path (identical results — pytest rank-identity)."""
        if self.n_docs > self.driver_max_docs:
            return self.search_df(
                query, k, mode=mode,
                strategy="blockmax" if strategy in ("auto", "blockmax") else strategy,
                role_boosts=role_boosts, tool_boosts=tool_boosts,
                term_boosts=term_boosts, expand_synonyms=expand_synonyms,
            ).toPandas()
        terms = self.analyze_query(query, expand_synonyms)
        views = self._views(terms, term_boosts=term_boosts)
        if strategy == "auto":
            total_postings = sum(v.df for v in views)
            strategy = (
                "blockmax"
                if len(views) <= 8 and total_postings > 16 * codec_BLOCK
                else "exhaustive"
            )
        nm = self._load_norms()
        boost_of, max_boost = self._boost_arrays(role_boosts, tool_boosts)
        kern = scoring.blockmax_topk if strategy == "blockmax" else scoring.exhaustive_topk
        kwargs = dict(dl_base=0, boost_of=boost_of, mode=mode, deleted=self.tombstones)
        if strategy == "blockmax":
            kwargs["max_boost"] = max_boost
        docs, scores = kern(views, nm["dl"], self.avgdl, k, **kwargs)
        return self._materialize(docs, scores)

    def count(self, query: str | list[str], mode: str = "or") -> int:
        """Q7 size(0) total-hits count (distributed above the corpus
        threshold — a stop-word count must not decode postings driver-side
        at 10^9 docs)."""
        if self.n_docs > self.driver_max_docs:
            return self.count_df(query, mode)
        terms = self.analyze_query(query)
        views = [v for v in self._views(terms) if v.df > 0]
        if not views:
            return 0
        if mode == "and" and len(views) < len(set(terms)):
            return 0
        sets = [v.decode_all()[0] for v in views]
        acc = sets[0]
        for s in sets[1:]:
            acc = np.intersect1d(acc, s) if mode == "and" else np.union1d(acc, s)
        if len(self.tombstones):
            acc = acc[~np.isin(acc, self.tombstones)]
        return int(len(acc))

    def phrase_search(self, phrase: str, k: int = 10) -> pd.DataFrame:
        """match_phrase: adjacent in-order terms (unscored filter in the
        reference; we also return BM25 scores of the AND-group for ranking)."""
        if self.n_docs > self.driver_max_docs:
            return self.phrase_search_df(phrase, k).toPandas()
        terms = tokenize_py(phrase) if isinstance(phrase, str) else list(phrase)
        self._require_positions(terms)
        views = self._views(terms)
        if any(v.df == 0 for v in views):
            return self._materialize(np.zeros(0, np.int64), np.zeros(0, np.float64))
        sets = [v.decode_all()[0] for v in views]
        inter = sets[0]
        for s in sets[1:]:
            inter = np.intersect1d(inter, s)
        # adjacency check needs views in QUERY order (term i at position p+i),
        # not the sorted order _views returns
        by_term = {v.term: v for v in views}
        ordered = [by_term[t] for t in terms]
        hits = scoring.phrase_docs(ordered, inter) if len(terms) > 1 else inter
        if len(self.tombstones):
            hits = hits[~np.isin(hits, self.tombstones)]
        nm = self._load_norms()
        # score every AND-matching doc, keep the phrase hits, then top-k
        docs, scores = scoring.exhaustive_topk(
            views, nm["dl"], self.avgdl, k=max(1, len(inter)), mode="and"
        )
        keep = np.isin(docs, hits)
        docs, scores = docs[keep][:k], scores[keep][:k]
        return self._materialize(docs, scores)

    def _require_positions(self, terms: list[str]) -> None:
        """Multi-term phrase queries need positional postings; an index
        built with the default ``with_positions=False`` (postings ~40%
        smaller — see BENCH.md) cannot answer them. Fail loudly up front:
        without this guard an empty AND-intersection would silently return
        0 hits before the decoder ever noticed the missing pos_bytes."""
        if len(terms) > 1 and not self.manifest.get("with_positions"):
            raise ValueError(
                "phrase queries need a positional index: this index was "
                "built with with_positions=False; rebuild with "
                "build_index(..., with_positions=True)"
            )

    # ------------------------------------------------- dictionary expansion
    def expand_prefix(self, prefix: str, max_expansions: int = 50) -> list[str]:
        """Term-dictionary range scan (search_as_you_type / bool_prefix
        analogue). Highest-df expansions first (ES default ordering)."""
        d = self.term_dictionary()
        terms = d["term"].to_numpy(object)
        lo = np.searchsorted(terms, prefix, side="left")
        # upper bound: append the max code point so supplementary-plane
        # characters (> U+FFFF) starting with the prefix are included
        hi = np.searchsorted(terms, prefix + "\U0010FFFF", side="right")
        cand = d.iloc[lo:hi].nlargest(max_expansions, "df")
        return cand["term"].tolist()

    def expand_fuzzy(self, term: str, max_edits: int | None = None, max_expansions: int = 50) -> list[str]:
        """AUTO-fuzziness expansion against the term dictionary. Driver-side
        over the cached dictionary; the scale path is the same predicate as
        a Spark filter (F.length + F.levenshtein) over term_stats."""
        d = auto_fuzziness(term) if max_edits is None else max_edits
        td = self.term_dictionary()
        if d == 0:
            return [term] if (td["term"] == term).any() else []
        lens = td["term"].str.len()
        cand = td[(lens >= len(term) - d) & (lens <= len(term) + d)]
        ok = levenshtein_within(term, cand["term"].to_numpy(object), d)
        hits = cand[ok]
        return hits.nlargest(max_expansions, "df")["term"].tolist()

    @staticmethod
    def _wildcard_regex(pattern: str) -> str:
        """ES wildcard syntax → regex source: ``*`` any sequence, ``?``
        one char, everything else literal; anchored by the caller."""
        import re as _re

        return "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in pattern
        )

    def expand_wildcard(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """ES wildcard-query expansion over the term dictionary (anchored
        whole-term match). The literal prefix before the first wildcard
        prunes the sorted dictionary to a range first — the analogue of
        Lucene seeking the TermsEnum to the pattern's common prefix.
        Highest-df expansions first (same selection as expand_prefix)."""
        import re as _re

        lit = _re.match(r"[^*?]*", pattern).group(0)
        rx = _re.compile(self._wildcard_regex(pattern))
        d = self.term_dictionary()
        if lit:
            terms = d["term"].to_numpy(object)
            lo = np.searchsorted(terms, lit, side="left")
            hi = np.searchsorted(terms, lit + "\U0010FFFF", side="right")
            d = d.iloc[lo:hi]
        hits = d[d["term"].str.fullmatch(rx)]
        return hits.nlargest(max_expansions, "df")["term"].tolist()

    def expand_regexp(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """ES regexp-query expansion (anchored whole-term match) against
        the driver-resident dictionary. Dialect note: patterns execute as
        Python ``re`` here and as Java regex on the distributed path
        (``expand_regexp_df``) — stick to the common subset (literals,
        classes, ``.|*+?()[]``), which also covers Lucene's dialect."""
        d = self.term_dictionary()
        hits = d[d["term"].str.fullmatch(pattern)]
        return hits.nlargest(max_expansions, "df")["term"].tolist()

    def suggest(
        self,
        query: str,
        k: int = 10,
        *,
        fuzzy: bool = True,
        role_boosts: dict[str, float] | None = None,
        boosts: tuple[float, float, float] = (10.0, 5.0, 2.0),
    ) -> pd.DataFrame:
        """Search-as-you-type: ``multi_match bool_prefix`` analogue
        (IndexerServiceIT.java:219-238) — all tokens but the last as terms
        (fuzzy-expanded when enabled), the last as a prefix OR-group.

        On a suggest-analyzed index (built with ``analyzer="suggest"``,
        i.e. the shingle chain — the search_suggestions field) the prefix
        expansion also matches multi-word shingles, and expansions carry
        the reference's per-field boosts: base^10, _2gram^5, _3gram^2
        (word count of the matched dictionary entry picks the tier)."""
        if self.n_docs > self.driver_max_docs:
            return self.suggest_df(
                query, k, fuzzy=fuzzy, role_boosts=role_boosts, boosts=boosts
            ).toPandas()
        toks = tokenize_py(query)
        if not toks:
            return self._materialize(np.zeros(0, np.int64), np.zeros(0, np.float64))
        terms: list[str] = []
        for t in toks[:-1]:
            terms.extend(self.expand_fuzzy(t) if fuzzy else [t])
        expansions = self.expand_prefix(toks[-1]) or [toks[-1]]
        terms.extend(expansions)
        term_boosts = None
        if self.manifest.get("analyzer") == "suggest":
            b1, b2, b3 = boosts
            term_boosts = {
                t: (b1 if t.count(" ") == 0 else b2 if t.count(" ") == 1 else b3)
                for t in terms
            }
        return self.search(
            list(dict.fromkeys(terms)), k,
            role_boosts=role_boosts, term_boosts=term_boosts,
        )

    # ------------------------------------------------------ scan/point ops
    def doc_stats_df(self) -> DataFrame:
        return self._doc_stats_src

    def get(self, doc_id: str) -> pd.DataFrame:
        """Q1 ids lookup (point fetch, parquet predicate pushdown).
        Tombstoned ordinals are masked so a post-upsert lookup returns only
        the live version — consistent with the scored paths."""
        pdf = self._doc_ds.to_table(filter=pc.field("doc_id") == doc_id).to_pandas()
        if len(self.tombstones) and len(pdf):
            pdf = pdf[~pdf["doc_ord"].isin(self.tombstones)].reset_index(drop=True)
        return pdf

    def scan_after(
        self, cursor: tuple[str, int] | None = None, page_size: int = 100
    ) -> DataFrame:
        """Q4 match_all + stable sort + search_after keyset pagination
        (GeoNetworkServiceImpl.java:585-603). Predicate pushes to parquet;
        no deep-offset skip. Deleted docs are masked: IN-literal while the
        tombstone set is small (pushes to the scan), broadcast anti-join
        past ~10k so heavy churn never bloats the plan — a compacting
        rebuild remains the durable remedy."""
        from ..streaming.incremental import mask_tombstones

        df = mask_tombstones(self.doc_stats_df(), self.tombstones)
        df = df.select("conv_id", "turn_idx", "doc_id", "role", "text")
        if cursor is not None:
            c, t = cursor
            df = df.filter(
                (F.col("conv_id") > c)
                | ((F.col("conv_id") == c) & (F.col("turn_idx") > t))
            )
        return df.orderBy("conv_id", "turn_idx").limit(page_size)

    # ------------------------------------------------------ distributed path
    #
    # Full feature parity with the driver path (synonyms, term/role/tool
    # boosts, phrase, suggest, count): any query answerable at sf0.1 on the
    # driver is answerable at 10^9 docs here, with NO O(corpus) driver state
    # — global term stats come from a pruned parquet filter (rows = query
    # terms), everything else rides the segment cogroup.

    def _global_dfs(self, terms: list[str]) -> dict[str, int]:
        """Corpus-wide df per query term (idf is a global statistic). A
        pruned driver-side pyarrow read of term_stats (tlen partition
        pruning + term filter) returning len(terms) rows — never the full
        dictionary, and no Spark job: the former pruned-Spark-filter
        collect cost a whole job's scheduling per cold term set (the
        ~0.12 s df-lookup leg of the per-query floor decomposed in
        BENCH_NOTES round 5). Driver state stays O(query terms), the same
        bound as the stored-fields point-read."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            got = {t: 0 for t in missing}
            if self._term_dict is not None:  # driver dict already resident
                td = self._term_dict
                sub = td[td["term"].isin(missing)]
                got.update(dict(zip(sub["term"], sub["df"].astype(int))))
            else:
                from ..index.build import TLEN_CAP

                self._check_dictionary_snapshot()
                ds = pads.dataset(
                    self.term_stats_path, partitioning="hive",
                    format="parquet",
                )
                filt = pc.field("term").isin(missing)
                if "tlen" in ds.schema.names:  # partition-prune to lengths
                    lens = sorted({min(len(t), TLEN_CAP) for t in missing})
                    filt = filt & pc.field("tlen").isin(lens)
                tbl = ds.to_table(columns=["term", "df"], filter=filt)
                got.update({
                    t: int(d) for t, d in zip(
                        tbl.column("term").to_pylist(),
                        tbl.column("df").to_pylist(),
                    )
                })
            self._df_cache.update(got)
        return {t: self._df_cache[t] for t in terms}

    _DOC_SIDE_SCHEMA = (
        "seg int, base long, n_docs int, dl_bytes binary, "
        "role_bytes binary, tool_bytes binary, "
        "role_dict array<string>, tool_dict array<string>"
    )

    def _doc_side(self) -> DataFrame:
        """Seg-partitioned, persisted doc norms for the distributed path —
        the executor-resident analogue of Lucene's per-shard NORMS FILE:
        ONE packed row per segment (base ordinal + int32 dl array + int16
        role/tool code arrays as binary blobs) instead of one Arrow row
        per document. Per-query transfer is then ~8 B/doc of packed bytes
        with zero per-row Arrow/pandas overhead — at 10^9 docs the
        row-per-doc layout would stream the entire norms table through
        Python on EVERY query. The pack is paid once per searcher; the
        persisted HashPartitioning on seg matches the cogroup's required
        distribution, so repeated queries skip the doc-side shuffle
        entirely. Packing relies on the build invariant that each segment
        covers a dense doc_ord range (asserted per segment).

        Role/tool values are dictionary-encoded with SEGMENT-LOCAL code
        maps shipped inside each packed row, so building the doc side is
        ONE corpus scan with no global vocabulary pass and no driver
        state; the scoring kernel turns query-time boost dicts into
        O(#codes) lookup tables from the row's own dictionaries. A
        searcher is a point-in-time snapshot; refresh() to see appends."""
        if self._doc_side_df is None:
            ds = self.doc_stats_df().select("seg", "doc_ord", "dl", "role", "tool")

            def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("doc_ord")
                ords = pdf["doc_ord"].to_numpy(np.int64)
                base, n_rows = int(ords[0]), len(ords)
                span = int(ords[-1]) - base + 1
                if len(np.unique(ords)) != n_rows:  # not assert: -O
                    raise ValueError(
                        f"segment {key[0]} has duplicate doc ordinals — "
                        "packed norms would misalign"
                    )
                # SEGMENT-LOCAL dictionaries: codes only need to be
                # consistent within the packed row they ship with, so no
                # global vocabulary pass (or driver code state) exists at
                # all — the pack is ONE corpus scan total. Code 0 = null.
                rc, r_uniq = pd.factorize(pdf["role"], use_na_sentinel=True)
                tc, t_uniq = pd.factorize(pdf["tool"], use_na_sentinel=True)
                if max(len(r_uniq), len(t_uniq)) >= 32_767:  # int16 wrap
                    raise ValueError(
                        f"segment {key[0]}: role/tool cardinality "
                        f"({len(r_uniq)}/{len(t_uniq)}) exceeds int16 codes — "
                        "these are bounded categoricals by schema; widen the "
                        "code dtype if that ever changes"
                    )
                dl = pdf["dl"].to_numpy(np.int32)
                r_codes = (rc + 1).astype("<i2")
                t_codes = (tc + 1).astype("<i2")
                if span != n_rows:
                    # expunged holes (index/merge.py): densify over the
                    # span — holes get dl 0 / code 0 (null) and are never
                    # read, since expunged docs left the posting lists
                    pos = ords - base
                    d = np.zeros(span, dtype=np.int32); d[pos] = dl
                    r = np.zeros(span, dtype="<i2"); r[pos] = r_codes
                    t = np.zeros(span, dtype="<i2"); t[pos] = t_codes
                    dl, r_codes, t_codes = d, r, t
                return pd.DataFrame(
                    [
                        {
                            "seg": int(key[0]),
                            "base": base,
                            "n_docs": n_rows,
                            "dl_bytes": dl.astype("<i4").tobytes(),
                            "role_bytes": r_codes.tobytes(),
                            "tool_bytes": t_codes.tobytes(),
                            "role_dict": [str(v) for v in r_uniq],
                            "tool_dict": [str(v) for v in t_uniq],
                        }
                    ]
                )

            n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            self._doc_side_df = (
                ds.groupBy("seg")
                .applyInPandas(pack, self._DOC_SIDE_SCHEMA)
                # explicit repartition: the packed rows are tiny, so AQE
                # would coalesce the pack's shuffle to 1-2 partitions and
                # the cached partitioning would serialize the scoring
                # cogroup into 1-2 tasks; a user-specified repartition is
                # AQE-exempt and keeps the scoring stage n-wide
                .repartition(n, "seg")
                # snapshot token: Spark's CacheManager serves a cached
                # plan to any LATER plan with the same result — two
                # searchers open over one index across an append/merge
                # would silently share ONE doc-side cache (the older
                # snapshot's), dropping the newer searcher's segments.
                # A per-searcher literal makes the plans distinct; the
                # scoring kernels read columns by name and ignore it.
                .withColumn("_snap", F.lit(self._snapshot_token))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        return self._doc_side_df

    def refresh(self) -> "IndexSearcher":
        """Reopen at the CURRENT state of the index (Lucene's
        DirectoryReader.openIfChanged): releases this searcher's
        executor-side caches and returns a fresh point-in-time searcher
        that sees all appends/deletes/compactions committed since this
        one opened."""
        self.close()
        return IndexSearcher(self.spark, self.index_dir)

    def close(self) -> None:
        """Release executor-side caches (the persisted doc-side norms)."""
        if self._doc_side_df is not None:
            self._doc_side_df.unpersist()
            self._doc_side_df = None

    def _postings_df(self, terms: list[str]) -> DataFrame:
        buckets = sorted({term_bucket(t, self.n_buckets) for t in terms})
        return (
            self._postings_src
            .filter(F.col("tbucket").isin(buckets) & F.col("term").isin(terms))
            .select(*self._posting_cols())
        )

    def search_df(
        self,
        query: str | list[str],
        k: int = 10,
        *,
        mode: str = "or",
        strategy: str = "blockmax",
        role_boosts: dict[str, float] | None = None,
        tool_boosts: dict[str, float] | None = None,
        term_boosts: dict[str, float] | None = None,
        expand_synonyms: bool = False,
        phrase_terms: list[str] | None = None,
    ) -> DataFrame:
        """Segment-parallel top-k: every segment (= shard) scores its own
        doc range with the same numpy kernel, emits a local top-k, and the
        tiny union is globally sorted. Scales to any corpus the build
        scaled to — no driver-side norms.

        NOTE: the scoring phase runs EAGERLY at call time (the k scored
        ordinals are collected and pushed into the doc_stats scan as a
        pruning literal — the stored-fields point-read; a lazy join would
        full-scan doc_stats per query). The returned DataFrame is the
        cheap k-row enrichment plan.

        ``phrase_terms`` (query-ordered) restricts hits to docs where those
        terms occur adjacently in order (match_phrase); requires a
        with_positions index. The adjacency test is segment-local because a
        doc lives in exactly one segment."""
        if phrase_terms:
            self._require_positions(phrase_terms)
        terms = self.analyze_query(query, expand_synonyms)
        uniq_terms = sorted(set(terms))
        dfs = self._global_dfs(uniq_terms)
        empty = self.spark.createDataFrame(
            [],
            "doc_ord long, doc_id string, conv_id string, turn_idx int, "
            "role string, score double",
        )
        if not uniq_terms or (
            (mode == "and" or phrase_terms) and any(dfs[t] == 0 for t in uniq_terms)
        ):
            return empty
        postings = self._postings_df(uniq_terms)
        doc_side = self._doc_side()
        n_docs, avgdl = self.n_docs, self.avgdl
        rb, tb = role_boosts or {}, tool_boosts or {}
        qb = term_boosts or {}
        max_boost = max([1.0] + list(rb.values()) + list(tb.values()))
        tombstones = self.tombstones  # small; broadcast-join a DF if huge
        if phrase_terms:
            mode = "and"

        def score_seg(pq: pd.DataFrame, dq: pd.DataFrame) -> pd.DataFrame:
            if len(pq) == 0 or len(dq) == 0:
                return pd.DataFrame({"doc_ord": [], "score": []})
            r0 = dq.iloc[0]
            base = int(r0["base"])
            dl_of = np.frombuffer(r0["dl_bytes"], dtype="<i4").astype(np.int64)
            boost_of = None
            if rb or tb:
                # boost dicts → O(#codes) lookup tables built from the
                # row's SEGMENT-LOCAL dictionaries (code 0 = null → 1.0)
                r_dict = list(r0["role_dict"])
                t_dict = list(r0["tool_dict"])
                rlut = np.ones(len(r_dict) + 1, dtype=np.float64)
                for i, name in enumerate(r_dict):
                    if name in rb:
                        rlut[i + 1] = rb[name]
                tlut = np.ones(len(t_dict) + 1, dtype=np.float64)
                for i, name in enumerate(t_dict):
                    if name in tb:
                        tlut[i + 1] = tb[name]
                boost_of = (
                    rlut[np.frombuffer(r0["role_bytes"], dtype="<i2")]
                    * tlut[np.frombuffer(r0["tool_bytes"], dtype="<i2")]
                )
            pq = pq.sort_values(["term", "seg", "min_doc"])
            by_term = {
                t: scoring.TermView(
                    t, pq[pq["term"] == t], dfs[t], n_docs, boost=qb.get(t, 1.0)
                )
                for t in uniq_terms
                if dfs[t] > 0
            }
            views = list(by_term.values())
            if phrase_terms:
                # phrase filter first: AND-intersect, then adjacency
                ordered = [by_term[t] for t in phrase_terms]
                sets = [v.decode_all()[0] for v in ordered]
                inter = sets[0]
                for s in sets[1:]:
                    inter = np.intersect1d(inter, s)
                hits = (
                    scoring.phrase_docs(ordered, inter)
                    if len(phrase_terms) > 1
                    else inter
                )
                if len(tombstones):
                    hits = hits[~np.isin(hits, tombstones)]
                if len(hits) == 0:
                    return pd.DataFrame({"doc_ord": [], "score": []})
                docs, scores = scoring.exhaustive_topk(
                    views, dl_of, avgdl, k=max(1, len(inter)),
                    dl_base=base, boost_of=boost_of, mode="and",
                    deleted=tombstones,
                )
                keep = np.isin(docs, hits)
                docs, scores = docs[keep][:k], scores[keep][:k]
                return pd.DataFrame({"doc_ord": docs, "score": scores})
            kern = (
                scoring.blockmax_topk if strategy == "blockmax" else scoring.exhaustive_topk
            )
            kw = dict(dl_base=base, boost_of=boost_of, mode=mode, deleted=tombstones)
            if strategy == "blockmax":
                kw["max_boost"] = max_boost
            docs, scores = kern(views, dl_of, avgdl, k, **kw)
            return pd.DataFrame({"doc_ord": docs, "score": scores})

        out_schema = T.StructType(
            [
                T.StructField("doc_ord", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        local = (
            postings.groupBy("seg")
            .cogroup(doc_side.groupBy("seg"))
            .applyInPandas(lambda key, pq, dq: score_seg(pq, dq), out_schema)
        )
        # The scored top-k is k rows — collect it, then attach the stored
        # fields with a point-read. A lazy join here would full-scan
        # doc_stats per query (at 10^9 docs: the whole stored-fields
        # table for k rows).
        top_rows = local.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k).collect()
        if not top_rows:
            return empty
        ords = [int(r["doc_ord"]) for r in top_rows]
        scores = {int(r["doc_ord"]): float(r["score"]) for r in top_rows}
        return self._enrich_topk(ords, scores, empty)

    def _enrich_topk(self, ords: list[int], scores: dict[int, float],
                     empty: DataFrame) -> DataFrame:
        """Stored-fields point-read for k scored ordinals — the fetch
        phase after scoring. Below the shared plan-bloat threshold this
        is a DRIVER-side pyarrow read (doc_stats is written doc_ord-
        ordered, so the filter prunes to <=k row groups: ~20 ms vs
        ~180 ms for the equivalent one-off Spark job — measured round 6;
        the driver holds k rows, never the corpus) returned as a k-row
        local relation. Past the threshold it stays the distributed
        broadcast-join plan, which bounds the result without a giant
        IN-literal."""
        from ..planlimits import IN_LITERAL_MAX

        if len(ords) <= IN_LITERAL_MAX:
            import pyarrow.compute as pc2

            pdf = self._doc_ds.to_table(
                columns=["doc_ord", "doc_id", "conv_id", "turn_idx", "role"],
                filter=pc2.field("doc_ord").isin(ords),
            ).to_pandas()
            pdf["score"] = pdf["doc_ord"].map(scores)
            pdf = pdf.sort_values(
                ["score", "doc_ord"], ascending=[False, True]
            ).reset_index(drop=True)
            return self.spark.createDataFrame(
                pdf[["doc_ord", "doc_id", "conv_id", "turn_idx", "role",
                     "score"]],
                schema=empty.schema,
            )
        score_df = self.spark.createDataFrame(
            pd.DataFrame(
                {"doc_ord": np.asarray(ords, dtype=np.int64),
                 "score": [scores[o] for o in ords]}
            )
        )
        base = self.doc_stats_df().select(
            "doc_ord", "doc_id", "conv_id", "turn_idx", "role"
        )
        return (
            base
            .join(F.broadcast(score_df), "doc_ord")
            .select("doc_ord", "doc_id", "conv_id", "turn_idx", "role", "score")
            .orderBy(F.desc("score"), F.asc("doc_ord"))
        )

    def scores_df(
        self,
        query: str | list[str],
        *,
        term_boosts: dict[str, float] | None = None,
        expand_synonyms: bool = False,
    ) -> DataFrame:
        """FULL matching-doc score vector (doc_ord, score) — no top-k cut.
        The distributed building block for multi-field merges, where
        per-field vectors must sum BEFORE any heap (a doc mid-rank in every
        field can be top overall). Output size is bounded by the docs
        matching the query terms, partitioned by segment."""
        terms = self.analyze_query(query, expand_synonyms)
        uniq_terms = sorted(set(terms))
        dfs = self._global_dfs(uniq_terms)
        if not uniq_terms or all(dfs[t] == 0 for t in uniq_terms):
            return self.spark.createDataFrame([], "doc_ord long, score double")
        postings = self._postings_df(uniq_terms)
        doc_side = self._doc_side()  # extra role/tool cols are harmless
        n_docs, avgdl = self.n_docs, self.avgdl
        qb = term_boosts or {}
        tombstones = self.tombstones

        def score_seg(pq: pd.DataFrame, dq: pd.DataFrame) -> pd.DataFrame:
            if len(pq) == 0 or len(dq) == 0:
                return pd.DataFrame({"doc_ord": [], "score": []})
            r0 = dq.iloc[0]
            base = int(r0["base"])
            dl_of = np.frombuffer(r0["dl_bytes"], dtype="<i4").astype(np.int64)
            pq = pq.sort_values(["term", "seg", "min_doc"])
            views = [
                scoring.TermView(
                    t, pq[pq["term"] == t], dfs[t], n_docs, boost=qb.get(t, 1.0)
                )
                for t in uniq_terms
                if dfs[t] > 0
            ]
            docs, scores = scoring.exhaustive_topk(
                views, dl_of, avgdl, k=len(dl_of), dl_base=base,
                mode="or", deleted=tombstones,
            )
            return pd.DataFrame({"doc_ord": docs, "score": scores})

        out_schema = T.StructType(
            [
                T.StructField("doc_ord", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        return (
            postings.groupBy("seg")
            .cogroup(doc_side.groupBy("seg"))
            .applyInPandas(lambda key, pq, dq: score_seg(pq, dq), out_schema)
        )

    def count_df(self, query: str | list[str], mode: str = "or") -> int:
        """Q7 count, distributed: per-segment set algebra over the pruned
        posting chunks (each doc lives in exactly one segment, so segment
        counts sum exactly). Single-term, tombstone-free counts short-cut
        to the term dictionary row — no postings decoded at all."""
        terms = self.analyze_query(query)
        uniq_terms = sorted(set(terms))
        if not uniq_terms:
            return 0
        dfs = self._global_dfs(uniq_terms)
        if mode == "and" and any(dfs[t] == 0 for t in uniq_terms):
            return 0
        if len(uniq_terms) == 1 and not len(self.tombstones):
            return dfs[uniq_terms[0]]
        tombstones = self.tombstones
        n_docs = self.n_docs

        def count_seg(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame({"n": []})
            pdf = pdf.sort_values(["term", "seg", "min_doc"])
            sets = []
            for t in uniq_terms:
                chunks = pdf[pdf["term"] == t]
                if len(chunks) == 0:
                    if mode == "and":
                        return pd.DataFrame({"n": [0]})
                    continue
                v = scoring.TermView(t, chunks, int(chunks["df_chunk"].sum()), n_docs)
                sets.append(v.decode_all()[0])
            if not sets:
                return pd.DataFrame({"n": [0]})
            acc = sets[0]
            for s in sets[1:]:
                acc = np.intersect1d(acc, s) if mode == "and" else np.union1d(acc, s)
            if len(tombstones):
                acc = acc[~np.isin(acc, tombstones)]
            return pd.DataFrame({"n": [len(acc)]})

        per_seg = (
            self._postings_df(uniq_terms)
            .groupBy("seg")
            .applyInPandas(lambda key, pdf: count_seg(pdf), "n long")
        )
        row = per_seg.agg(F.sum("n").alias("total")).collect()[0]
        return int(row["total"] or 0)

    def phrase_search_df(self, phrase: str, k: int = 10) -> DataFrame:
        """Q3 match_phrase, distributed (see ``phrase_terms`` in
        ``search_df``)."""
        terms = tokenize_py(phrase) if isinstance(phrase, str) else list(phrase)
        return self.search_df(terms, k, mode="and", phrase_terms=terms)

    # ---------------------------------------- distributed dictionary expansion
    def _check_dictionary_snapshot(self) -> None:
        """Raise SnapshotExpiredError (not a lazy FileNotFoundException)
        when this searcher's term-stats directory was expired by the
        current+previous retention of later appends. Cheap local-stat;
        resident caches (term_dictionary already loaded) keep working."""
        if not os.path.isdir(self.term_stats_path):
            raise SnapshotExpiredError(
                f"term-stats snapshot {self.term_stats_path} was expired by "
                "later appends (retention keeps the current + previous "
                "dictionary). Call refresh() or open a new IndexSearcher."
            )

    def _term_stats_sdf(self) -> DataFrame:
        self._check_dictionary_snapshot()
        return self._term_stats_src

    def _tlen_prune(self, td: DataFrame, lo: int, hi: int) -> DataFrame:
        """Partition-prune the dictionary scan to length buckets [lo, hi]
        (term_stats is hive-partitioned by capped term length — build.py
        ``term_len_col``). No-op on a pre-tlen index layout."""
        if "tlen" not in td.columns:
            return td
        return td.filter((F.col("tlen") >= lo) & (F.col("tlen") <= hi))

    def expand_prefix_df(self, prefix: str, max_expansions: int = 50) -> list[str]:
        """Prefix expansion as a pruned Spark filter over the term-sorted
        term_stats parquet (StringStartsWith pushes to the scan; row groups
        outside the prefix range never load, and length partitions shorter
        than the prefix are never listed). Highest-df first, term-order
        tie-break — identical selection to the driver ``expand_prefix``."""
        from ..index.build import TLEN_CAP

        td = self._tlen_prune(
            self._term_stats_sdf(), min(len(prefix), TLEN_CAP), TLEN_CAP
        )
        rows = (
            td.filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def expand_fuzzy_df(
        self, term: str, max_edits: int | None = None, max_expansions: int = 50
    ) -> list[str]:
        """AUTO-fuzziness expansion over term_stats: the tlen PARTITION
        filter (``|len(t) - len(q)| <= d`` is a necessary edit-distance
        condition) prunes the scan to ~(2d+1) length directories before a
        file is opened — the columnar analogue of Lucene's Levenshtein-
        automaton FST walk bounding the TermsEnum — then the exact
        F.length band + F.levenshtein bound (both JVM-side) decide.
        tests/test_plan_guards.py asserts the pruned scan reads a strict
        subset of the dictionary's files."""
        from ..index.build import term_len_band

        d = auto_fuzziness(term) if max_edits is None else max_edits
        lo, hi = term_len_band(len(term), d)
        td = self._tlen_prune(self._term_stats_sdf(), lo, hi)
        if d == 0:
            rows = td.filter(F.col("term") == term).limit(1).collect()
            return [term] if rows else []
        rows = (
            td.filter(
                (F.length("term") >= len(term) - d)
                & (F.length("term") <= len(term) + d)
                & (F.levenshtein(F.lit(term), F.col("term")) <= d)
            )
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def expand_wildcard_df(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """Wildcard expansion as a pruned Spark filter over term_stats:
        the literal prefix pushes as StringStartsWith (plus the tlen
        length-partition floor), then an anchored JVM ``rlike`` decides —
        same selection as the driver ``expand_wildcard``."""
        import re as _re

        from ..index.build import TLEN_CAP

        lit = _re.match(r"[^*?]*", pattern).group(0)
        td = self._term_stats_sdf()
        if lit:
            td = self._tlen_prune(td, min(len(lit), TLEN_CAP), TLEN_CAP)
            td = td.filter(F.col("term").startswith(lit))
        rows = (
            td.filter(F.col("term").rlike(f"^(?:{self._wildcard_regex(pattern)})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def expand_regexp_df(self, pattern: str, max_expansions: int = 50) -> list[str]:
        """Regexp expansion over term_stats via anchored JVM ``rlike``
        (see expand_regexp's dialect note)."""
        rows = (
            self._term_stats_sdf()
            .filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term")
            .collect()
        )
        return [r["term"] for r in rows]

    def suggest_df(
        self,
        query: str,
        k: int = 10,
        *,
        fuzzy: bool = True,
        role_boosts: dict[str, float] | None = None,
        boosts: tuple[float, float, float] = (10.0, 5.0, 2.0),
    ) -> DataFrame:
        """Q6 search-as-you-type, distributed end to end: expansions come
        from Spark filters on term_stats (tiny collect: <= max_expansions
        terms), scoring from the segment cogroup — no O(corpus|dictionary)
        driver state."""
        toks = tokenize_py(query)
        if not toks:
            return self.search_df([], k)
        terms: list[str] = []
        for t in toks[:-1]:
            terms.extend(self.expand_fuzzy_df(t) if fuzzy else [t])
        expansions = self.expand_prefix_df(toks[-1]) or [toks[-1]]
        terms.extend(expansions)
        term_boosts = None
        if self.manifest.get("analyzer") == "suggest":
            b1, b2, b3 = boosts
            term_boosts = {
                t: (b1 if t.count(" ") == 0 else b2 if t.count(" ") == 1 else b3)
                for t in terms
            }
        return self.search_df(
            list(dict.fromkeys(terms)), k,
            role_boosts=role_boosts, term_boosts=term_boosts,
        )
