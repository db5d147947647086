"""Segment reader: the query-time view of one SPIMI segment.

The Ray analog of the reference's materialized inverted lists
(``/root/reference/QryEval/QryIop.java:50-54``, ``InvList.java:109-154``): a
segment's postings parquet is memory-mapped once per actor (``__init__``-time,
never per batch) and individual (field,term) lists are decoded on demand into
numpy arrays, with an LRU-ish decode cache.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow.parquet as pq

from ..analysis import FIELDS
from . import encode
from .build import SEGMENT_DIR, STATS_FILE, TERMSTATS_DIR


class PostingList:
    """Decoded postings of one (field, term) within a segment.

    ``docs`` are LOCAL doc indices (int64, ascending) into the segment's doc
    table; ``positions`` is a flat int32 array sliced by ``offsets``
    (``offsets[i]:offsets[i+1]`` = positions of docs[i]).
    """

    __slots__ = ("docs", "tfs", "positions", "offsets", "bm")

    def __init__(self, docs, tfs, positions, bm=None):
        self.docs = docs
        self.tfs = tfs
        self.positions = positions
        self.offsets = np.concatenate(
            ([0], np.cumsum(tfs, dtype=np.int64))
        )
        self.bm = bm  # (max_doc, max_tf, min_dl) per block or None

    def pos_of(self, i: int) -> np.ndarray:
        return self.positions[self.offsets[i] : self.offsets[i + 1]]


class Segment:
    """One memory-mapped segment: doc table + term dictionary + postings."""

    def __init__(self, seg_dir: str, decode_cache: int = 4096):
        self.seg_dir = seg_dir
        self.name = os.path.basename(seg_dir)
        # posting codec is a per-segment property (MANIFEST.json) so a
        # mixed-codec index — e.g. bw segments plus vb-appended ones —
        # serves correctly; absent tag = the original bw layout
        try:
            with open(os.path.join(seg_dir, "MANIFEST.json")) as f:
                self.codec = json.load(f).get("codec", "bw")
        except OSError:
            self.codec = "bw"
        dm = pq.read_table(
            os.path.join(seg_dir, "docmeta.parquet"), memory_map=True
        )
        self.doc_ids = dm.column("doc_id").to_numpy()
        self.urls = np.asarray(dm.column("url").to_pylist(), dtype=object)
        self.doclen = {
            f: dm.column(f"len_{f}").to_numpy().astype(np.float64)
            for f in FIELDS
        }
        self.n_docs = len(self.doc_ids)
        tbl = pq.read_table(
            os.path.join(seg_dir, "postings.parquet"), memory_map=True
        )
        self._tbl = tbl
        # term dictionary: (field, term) -> row index
        fields = tbl.column("field").to_pylist()
        terms = tbl.column("term").to_pylist()
        self._dict = {
            (f, t): i for i, (f, t) in enumerate(zip(fields, terms))
        }
        self._df = tbl.column("df").to_numpy()
        self._ctf = tbl.column("ctf").to_numpy()
        self._cache: dict[tuple[str, str], Optional[PostingList]] = {}
        self._cache_cap = decode_cache
        self._fwd = None
        # tombstone mask over LOCAL doc indices (None = no deletes).
        # Deletes are result-filters only: postings, df/ctf and doclen
        # stats keep their pre-delete values until purge_deleted rewrites
        # the segment (the Lucene liveDocs semantics the reference's
        # Idx reader inherits: deleted docs vanish from results but
        # still count in index statistics until merge).
        self.dead: Optional[np.ndarray] = None

    def set_tombstones(self, tomb_ids: np.ndarray) -> None:
        """Install the index-level tombstone set (sorted global doc_ids);
        computes this segment's local dead mask once."""
        if tomb_ids is None or len(tomb_ids) == 0:
            self.dead = None
            return
        mask = np.isin(self.doc_ids, tomb_ids)
        self.dead = mask if mask.any() else None

    def postings(self, field: str, term: str) -> Optional[PostingList]:
        key = (field, term)
        if key in self._cache:
            return self._cache[key]
        row = self._dict.get(key)
        out = None
        if row is not None:
            out = PostingList(
                encode.decode_doc_ids(
                    self._tbl.column("docs")[row].as_py(), self.codec
                ).astype(np.int64),
                encode.decode_values(
                    self._tbl.column("tfs")[row].as_py(), self.codec
                ).astype(np.int64),
                encode.decode_values(
                    self._tbl.column("positions")[row].as_py(), self.codec
                ).astype(np.int32),
                bm=(
                    np.asarray(self._tbl.column("bm_max_doc")[row].as_py()),
                    np.asarray(self._tbl.column("bm_max_tf")[row].as_py()),
                    np.asarray(self._tbl.column("bm_min_dl")[row].as_py()),
                ),
            )
        if len(self._cache) >= self._cache_cap:
            self._cache.clear()
        self._cache[key] = out
        return out

    def warm(self, field: str = "body", top: int = 256) -> int:
        """Pre-decode the postings of the ``top`` highest-df terms of a
        field.  This MOVES the dense-term decode cost into actor startup
        (measured at 7.5M docs: startup 44s -> 123s, first query then
        runs at warm latency) — a win only for long-running serving where
        startup happens offline; leave 0 for batch jobs."""
        # clamp below the decode-cache cap: postings() clears the whole
        # cache at capacity, which would wipe the terms just warmed
        top = min(top, max(1, (self._cache_cap * 7) // 8))
        fields = np.asarray(
            self._tbl.column("field").to_pylist(), dtype=object
        )
        mask = fields == field
        rows_idx = np.nonzero(mask)[0]
        if not len(rows_idx):
            return 0
        dfs = self._df[rows_idx]
        if len(rows_idx) > top:  # O(V) selection, no vocab-sized py sort
            pick = rows_idx[np.argpartition(-dfs, top - 1)[:top]]
        else:
            pick = rows_idx
        terms = self._tbl.column("term")
        n = 0
        for i in pick:
            if self.postings(field, terms[int(i)].as_py()) is not None:
                n += 1
        return n

    def local_stats(self, field: str, term: str) -> tuple[int, int]:
        row = self._dict.get((field, term))
        if row is None:
            return 0, 0
        return int(self._df[row]), int(self._ctf[row])

    def forward(self):
        """Forward index (term vectors) if built with keep_forward: dict
        (doc_id, field) -> list[str] ('' = stopword position)."""
        if self._fwd is None:
            path = os.path.join(self.seg_dir, "fwd.parquet")
            self._fwd = {}
            if os.path.exists(path):
                t = pq.read_table(path, memory_map=True)
                for d, f, ts in zip(
                    t.column("doc_id").to_pylist(),
                    t.column("field").to_pylist(),
                    t.column("terms").to_pylist(),
                ):
                    self._fwd[(d, f)] = ts
        return self._fwd


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, STATS_FILE)) as f:
        return json.load(f)


TOMBSTONES_DIR = "tombstones"


def load_tombstones(index_dir: str) -> np.ndarray:
    """Union of all committed tombstone files as a sorted unique int64
    array (empty when no deletes).  Deletion lists are explicit inputs
    (takedowns, GDPR erasure) — bounded by the request volume, never
    corpus-sized; every searcher loads them once at startup."""
    import glob

    import pyarrow.parquet as pq

    root = os.path.join(index_dir, TOMBSTONES_DIR)
    parts = [
        pq.read_table(p, columns=["doc_id"]).column("doc_id").to_numpy()
        for p in sorted(glob.glob(os.path.join(root, "del-*.parquet")))
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts).astype(np.int64))


def list_segments(index_dir: str) -> list[str]:
    """Segment ids from the filesystem listing (stats.json carries only the
    COUNT — a segment list would be driver-sized at web scale).  An index
    dir belongs to one input corpus; a valid segment is one with a
    committed MANIFEST.json (the atomic-rename commit marker)."""
    seg_root = os.path.join(index_dir, SEGMENT_DIR)
    if not os.path.isdir(seg_root):
        return []
    return sorted(
        d
        for d in os.listdir(seg_root)
        if d.startswith("seg-")
        and os.path.exists(os.path.join(seg_root, d, "MANIFEST.json"))
    )


def segment_dirs(index_dir: str) -> list[str]:
    return [
        os.path.join(index_dir, SEGMENT_DIR, s)
        for s in list_segments(index_dir)
    ]


def load_termstats(
    index_dir: str, terms: Optional[list[tuple[str, str]]] = None
) -> dict[tuple[str, str], tuple[int, int]]:
    """Global (field,term) -> (df, ctf).

    With ``terms`` given, reads only the needed hash buckets (point-lookup
    path: O(query terms), not O(vocabulary) — the scale path for serving).
    Without, loads the full table (test/driver convenience at small scale).
    """
    import zlib

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from .build import TERMSTATS_BUCKETS

    ts_dir = os.path.join(index_dir, TERMSTATS_DIR)
    dataset = pads.dataset(ts_dir, partitioning="hive")
    if terms is not None:
        # hive-bucketed layout (bucket = crc32(term) % B): partition pruning
        # reads ONLY the query terms' bucket dirs — O(query terms), no scan
        tset = sorted({t for _, t in terms})
        buckets = sorted(
            {zlib.crc32(t.encode()) % TERMSTATS_BUCKETS for t in tset}
        )
        tbl = dataset.to_table(
            columns=["field", "term", "df", "ctf"],
            filter=pc.field("bucket").isin(buckets)
            & pc.field("term").isin(tset),
        )
    else:
        tbl = dataset.to_table(columns=["field", "term", "df", "ctf"])
    out = {}
    for f, t, df, ctf in zip(
        tbl.column("field").to_pylist(),
        tbl.column("term").to_pylist(),
        tbl.column("df").to_pylist(),
        tbl.column("ctf").to_pylist(),
    ):
        out[(f, t)] = (int(df), int(ctf))
    return out
