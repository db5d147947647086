"""Posting-list compression: delta-encoded docid gaps in byte-width-packed
blocks carrying block-max metadata.

Replaces what Lucene's codec did for the reference (the reference never
encodes postings itself — it reads Lucene's; SURVEY.md §4.3 specifies this
designed-from-scratch layout).

Format (little-endian, numpy-vectorized encode/decode, no Python per-value
loops):

``encode_doc_ids`` — sorted uint64 docids, blocks of 128:
    per block: ``base:u64 | count:u16 | width:u8`` then ``count-1`` deltas
    (``arr[i]-arr[i-1]``, first element stored as base) packed at the block's
    minimal byte width (1/2/4/8).
``encode_values`` — small positive ints (tfs, positions), same block format
    but absolute values (no delta), base unused.

Block-max metadata for block-max WAND (computed at build time WITHOUT a
second global pass — the bound ``tf/(tf+k1((1-b)+b*dl/avg))`` is monotone
increasing in tf and decreasing in doclen, so per-block ``max_tf`` and
``min_doclen`` yield a valid upper bound once global ``avg`` is known at
query time):
    arrays ``max_docid:u64, max_tf:u32, min_doclen:u32`` per block, stored as
    separate parquet list columns.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_HEADER = np.dtype([("base", "<u8"), ("count", "<u2"), ("width", "u1")])


def _pack(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into `width`-byte little-endian integers."""
    if width == 8:
        return vals.astype("<u8").tobytes()
    if width == 4:
        return vals.astype("<u4").tobytes()
    if width == 2:
        return vals.astype("<u2").tobytes()
    return vals.astype("u1").tobytes()


def _width_for(maxval: int) -> int:
    if maxval < 1 << 8:
        return 1
    if maxval < 1 << 16:
        return 2
    if maxval < 1 << 32:
        return 4
    return 8


def _encode_blocks(arr: np.ndarray, delta: bool) -> bytes:
    out = []
    n = len(arr)
    for start in range(0, n, BLOCK):
        blk = arr[start : start + BLOCK]
        if delta:
            base = int(blk[0])
            body = np.diff(blk)
        else:
            base = 0
            body = blk
        width = _width_for(int(body.max()) if len(body) else 0)
        hdr = np.zeros(1, dtype=_HEADER)
        hdr["base"] = base
        hdr["count"] = len(blk)
        hdr["width"] = width
        out.append(hdr.tobytes())
        out.append(_pack(body, width))
    return b"".join(out)


def _decode_blocks(buf: bytes, delta: bool) -> np.ndarray:
    pos = 0
    chunks = []
    hs = _HEADER.itemsize
    mv = memoryview(buf)
    while pos < len(buf):
        hdr = np.frombuffer(mv, dtype=_HEADER, count=1, offset=pos)[0]
        pos += hs
        count, width = int(hdr["count"]), int(hdr["width"])
        nvals = count - 1 if delta else count
        dt = {1: "u1", 2: "<u2", 4: "<u4", 8: "<u8"}[width]
        body = np.frombuffer(mv, dtype=dt, count=nvals, offset=pos).astype(
            np.uint64
        )
        pos += nvals * width
        if delta:
            blk = np.empty(count, dtype=np.uint64)
            blk[0] = hdr["base"]
            blk[1:] = hdr["base"] + np.cumsum(body)
            chunks.append(blk)
        else:
            chunks.append(body)
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(chunks)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Sorted docids -> delta blocks."""
    return _encode_blocks(np.asarray(doc_ids, dtype=np.uint64), delta=True)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    return _decode_blocks(buf, delta=True)


def encode_values(vals: np.ndarray) -> bytes:
    """Positive small ints (tfs / flat positions) -> absolute blocks."""
    return _encode_blocks(np.asarray(vals, dtype=np.uint64), delta=False)


def decode_values(buf: bytes) -> np.ndarray:
    return _decode_blocks(buf, delta=False)


def block_maxes(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray
) -> tuple[list[int], list[int], list[int]]:
    """Per-block (max_docid, max_tf, min_doclen) for block-max WAND."""
    max_doc, max_tf, min_dl = [], [], []
    for start in range(0, len(doc_ids), BLOCK):
        end = start + BLOCK
        max_doc.append(int(doc_ids[start:end][-1]))
        max_tf.append(int(tfs[start:end].max()))
        min_dl.append(int(doclens[start:end].min()))
    return max_doc, max_tf, min_dl
