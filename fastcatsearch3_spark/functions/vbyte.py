"""Delta-gap + variable-byte posting codec (SURVEY.md F-9, I-3, I-9).

Reference capability: fastcatsearch3 writes postings as delta-gapped,
variable-byte-encoded docNo/tf streams (core:ir.io.IOUtil.writeVInt /
readVInt [K]); BASELINE.json mandates the same scheme verbatim. This
module is a from-scratch **vectorized numpy** implementation — encode and
decode are O(bytes) with no per-value Python loops, so they run hot
inside Arrow/pandas UDFs (BASELINE.json input_hint: no per-row Python).

VByte wire format (protobuf-varint style): little-endian 7-bit groups,
MSB set ⇒ continuation.

Posting blob layout, block-addressable for block-max WAND (O-3):

    meta stream (one vbyte run):
        n                    total entries
        nblocks              ceil(n / block_size)
        block_size
        last_docno           docno of the final entry (accumulator sizing)
        block_first[nb]      first docno per block, delta-coded (abs first)
        block_maxtf[nb]      max tf per block            (WAND upper bound)
        block_mindl[nb]      min doc length per block    (WAND upper bound)
        block_bytes[nb]      encoded byte length of each block's data
    data: per block i, one vbyte run of
        deltas[cnt_i - 1]    docno gaps for entries 1.. (entry 0 = block_first)
        tfs[cnt_i]
        dls[cnt_i]           doc length (token count) per entry

cnt_i = block_size except the last block. docnos must be strictly
increasing uint64 (dense segment-local docNos — the reference's
segment-local docNo design, core:ir.document/DocumentWriter [K]).

Embedding dl per entry (vs a doc-length sidecar) costs ~1–2 bytes/entry
but means BM25 scoring touches ONLY the query terms' posting rows — at
10^12-doc scale a per-query scan of a doc-length table would dwarf the
posting read. The docmap table is consulted only to hydrate the final
top-k docnos back to doc_ids (Q-5), a pushdown-prunable k-row lookup.

Having per-block byte offsets + first-docno + maxima in the meta stream
means a scorer can establish a threshold and then decode ONLY the blocks
whose upper bound is competitive — true block skipping, not just score
skipping.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


# ---------------------------------------------------------------------------
# Raw vbyte primitives (vectorized)
# ---------------------------------------------------------------------------

def vbyte_encode(vals: np.ndarray, return_lens: bool = False):
    """Encode a uint64 array to a vbyte byte stream.

    Vectorized: the only loop is over the ≤10 possible byte positions.
    """
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = v.size
    if n == 0:
        empty = np.zeros(0, dtype=np.uint8)
        return (empty, np.zeros(0, dtype=np.int64)) if return_lens else empty
    # bytes needed per value
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += tmp > 0
        tmp >>= _U7
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    total = int(offsets[-1] + nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    shifted = v.copy()
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        pos = offsets[mask] + k
        byte = (shifted[mask] & _MASK7).astype(np.uint8)
        cont = (nb[mask] > k + 1).astype(np.uint8) * _CONT
        out[pos] = byte | cont
        shifted >>= _U7
    if return_lens:
        return out, nb
    return out


def vbyte_decode(buf: np.ndarray | bytes) -> np.ndarray:
    """Decode an entire vbyte stream to a uint64 array. Fully vectorized:
    value boundaries from the continuation-bit mask, per-value sums via
    np.add.reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & _CONT) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    contrib = (b.astype(np.uint64) & _MASK7) << (pos_in_val.astype(np.uint64) * _U7)
    return np.add.reduceat(contrib, starts)


def vbyte_decode_prefix(buf: np.ndarray, nvals: int) -> tuple[np.ndarray, int]:
    """Decode the first ``nvals`` values; return (values, bytes_consumed).

    Only scans a bounded prefix (≤ 10 bytes per value), so reading the
    meta stream of a huge posting blob never touches the data section.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if nvals == 0:
        return np.zeros(0, dtype=np.uint64), 0
    window = b[: nvals * 10]
    is_last = (window & _CONT) == 0
    ends = np.nonzero(is_last)[0][:nvals]
    if ends.size < nvals:
        raise ValueError("vbyte stream truncated")
    stop = int(ends[-1]) + 1
    vals = vbyte_decode(window[:stop])
    return vals[:nvals], stop


# ---------------------------------------------------------------------------
# Ragged-range helpers (vectorized gather of per-block slices)
# ---------------------------------------------------------------------------

def ragged_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [arange(s, s+c) for s, c in zip(starts, counts)] without
    a Python loop."""
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    rep_starts = np.repeat(starts.astype(np.int64), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    return rep_starts + within


def segment_sums(vals: np.ndarray, seg_starts: np.ndarray, out_dtype=np.int64) -> np.ndarray:
    """Sum of vals over segments beginning at seg_starts (may include
    empty segments, which np.add.reduceat mishandles)."""
    if vals.size == 0:
        return np.zeros(seg_starts.size, dtype=out_dtype)
    cs = np.concatenate(([0], np.cumsum(vals.astype(out_dtype))))
    seg_ends = np.concatenate((seg_starts[1:], [vals.size]))
    return cs[seg_ends] - cs[seg_starts]


# ---------------------------------------------------------------------------
# Posting blob encode/decode
# ---------------------------------------------------------------------------

@dataclass
class PostingMeta:
    n: int
    block_size: int
    last_docno: int
    block_first: np.ndarray   # absolute first docno per block (uint64)
    block_maxtf: np.ndarray   # uint64
    block_mindl: np.ndarray   # uint64
    block_bytes: np.ndarray   # int64
    data_offset: int          # byte offset where block data begins

    @property
    def nblocks(self) -> int:
        return int(self.block_first.size)

    def block_counts(self) -> np.ndarray:
        nb = self.nblocks
        cnts = np.full(nb, self.block_size, dtype=np.int64)
        if nb:
            cnts[-1] = self.n - self.block_size * (nb - 1)
        return cnts

    def block_data_offsets(self) -> np.ndarray:
        return self.data_offset + np.concatenate(
            ([0], np.cumsum(self.block_bytes[:-1]))
        ).astype(np.int64)


def encode_postings(
    docnos: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = 128,
) -> bytes:
    """Pack one term's (docno, tf, dl) arrays — docnos strictly increasing —
    into the block-addressable blob described in the module docstring."""
    n = int(docnos.size)
    if n == 0:
        raise ValueError("empty posting list")
    d = np.ascontiguousarray(docnos, dtype=np.uint64)
    t = np.ascontiguousarray(tfs, dtype=np.uint64)
    dl = np.ascontiguousarray(dls, dtype=np.uint64)
    bs = int(block_size)
    starts = np.arange(0, n, bs, dtype=np.int64)
    nb = starts.size
    cnts = np.minimum(starts + bs, n) - starts

    block_first = d[starts]
    block_maxtf = np.maximum.reduceat(t, starts)
    block_mindl = np.minimum.reduceat(dl, starts)

    gaps = np.diff(d)  # gaps[j] = d[j+1] - d[j]
    # per block: deltas for entries 1..cnt-1 are gaps[start .. start+cnt-2]
    delta_idx = ragged_ranges(starts, cnts - 1)
    tf_idx = ragged_ranges(starts, cnts)
    # interleave per block: [deltas_i, tfs_i, dls_i] — build a gather order
    nvals_per_block = 3 * cnts - 1
    vstarts = np.concatenate(([0], np.cumsum(nvals_per_block)[:-1]))
    V = np.empty(int(nvals_per_block.sum()), dtype=np.uint64)
    dpos = ragged_ranges(vstarts, cnts - 1)
    tpos = ragged_ranges(vstarts + (cnts - 1), cnts)
    lpos = ragged_ranges(vstarts + (2 * cnts - 1), cnts)
    V[dpos] = gaps[delta_idx]
    V[tpos] = t[tf_idx]
    V[lpos] = dl[tf_idx]

    data, lens = vbyte_encode(V, return_lens=True)
    block_bytes = segment_sums(lens, vstarts)

    bf_delta = np.empty(nb, dtype=np.uint64)
    bf_delta[0] = block_first[0]
    bf_delta[1:] = block_first[1:] - block_first[:-1]
    meta_vals = np.concatenate(
        [
            np.array([n, nb, bs, d[-1]], dtype=np.uint64),
            bf_delta,
            block_maxtf,
            block_mindl,
            block_bytes.astype(np.uint64),
        ]
    )
    meta = vbyte_encode(meta_vals)
    return meta.tobytes() + data.tobytes()


def decode_meta(blob: bytes | np.ndarray) -> PostingMeta:
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    head, consumed = vbyte_decode_prefix(b, 4)
    n, nb, bs, last = int(head[0]), int(head[1]), int(head[2]), int(head[3])
    rest, rest_bytes = vbyte_decode_prefix(b[consumed:], 4 * nb)
    bf = np.cumsum(rest[:nb].astype(np.uint64))
    return PostingMeta(
        n=n,
        block_size=bs,
        last_docno=last,
        block_first=bf,
        block_maxtf=rest[nb : 2 * nb],
        block_mindl=rest[2 * nb : 3 * nb],
        block_bytes=rest[3 * nb : 4 * nb].astype(np.int64),
        data_offset=consumed + rest_bytes,
    )


def decode_postings(
    blob: bytes | np.ndarray, meta: PostingMeta | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode → (docnos, tfs, dls), all uint64. One vectorized pass."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    meta = meta or decode_meta(b)
    n, nb = meta.n, meta.nblocks
    cnts = meta.block_counts()
    V = vbyte_decode(b[meta.data_offset :])
    nvals_per_block = 3 * cnts - 1
    vstarts = np.concatenate(([0], np.cumsum(nvals_per_block)[:-1]))
    dpos = ragged_ranges(vstarts, cnts - 1)
    tpos = ragged_ranges(vstarts + (cnts - 1), cnts)
    lpos = ragged_ranges(vstarts + (2 * cnts - 1), cnts)
    tfs = V[tpos]
    dls = V[lpos]
    # reconstruct docnos: within each block, docno = block_first + cumsum(deltas)
    full = np.zeros(n, dtype=np.uint64)
    entry_starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    nonstart_mask = np.ones(n, dtype=bool)
    nonstart_mask[entry_starts] = False
    full[nonstart_mask] = V[dpos]
    # block-start entries: delta from previous entry = block_first[i] - last
    # docno of block i-1; expressed so a single global cumsum reconstructs.
    deltasums = segment_sums(V[dpos], np.concatenate(([0], np.cumsum(cnts - 1)[:-1])), np.uint64)
    prev_last = np.empty(nb, dtype=np.uint64)
    prev_last[0] = 0
    prev_last[1:] = meta.block_first[:-1] + deltasums[:-1]
    full[entry_starts] = meta.block_first - prev_last
    docnos = np.cumsum(full)
    return docnos, tfs, dls


# ---------------------------------------------------------------------------
# Positions sidecar blob (J-5 phrase/proximity support)
#
# Positions live in a SEPARATE blob (its own parquet column), not inside the
# main posting blob — Lucene's .doc/.pos file split re-expressed as column
# pruning: queries without phrases never read a positions byte. Layout:
#
#     vbyte run: nblocks, block_bytes[nb]   (block structure mirrors the
#                                            main blob's entry blocking)
#     data: per block, the concatenation of each entry's vbyte run of
#           delta-gapped within-doc token positions (first absolute);
#           entry boundaries are implied by the main blob's tf values
#           (tf_e positions per entry — no per-entry length stored).
# ---------------------------------------------------------------------------

def encode_positions_blob(
    entry_pos_bytes: np.ndarray, block_size: int
) -> bytes:
    """Assemble one term's positions blob from per-entry already-encoded
    position byte runs (object array of bytes, in docno order)."""
    n = entry_pos_bytes.size
    lens = np.fromiter((len(b) for b in entry_pos_bytes), np.int64, count=n)
    starts = np.arange(0, n, block_size, dtype=np.int64)
    block_bytes = segment_sums(lens, starts)
    header = vbyte_encode(
        np.concatenate(
            [np.array([starts.size], dtype=np.uint64),
             block_bytes.astype(np.uint64)]
        )
    )
    return header.tobytes() + b"".join(entry_pos_bytes)


def decode_positions_blob(
    blob: bytes | np.ndarray, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Full decode → (flat absolute positions, entry start offsets into it).
    ``tfs`` = per-entry tf values from the main blob decode (entry e has
    tfs[e] positions). Vectorized: one vbyte pass + the cumsum-reset trick."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    head, consumed = vbyte_decode_prefix(b, 1)
    nb = int(head[0])
    _, skip = vbyte_decode_prefix(b[consumed:], nb)
    vals = vbyte_decode(b[consumed + skip:])
    tfs = tfs.astype(np.int64)
    entry_starts = np.concatenate(([0], np.cumsum(tfs[:-1])))
    if vals.size != int(tfs.sum()):
        raise ValueError("positions blob length mismatch with tf stream")
    cs = np.cumsum(vals)
    base = cs[entry_starts] - vals[entry_starts]
    flat = cs - np.repeat(base, tfs)
    return flat, entry_starts


def split_positions_bytes(
    blob: bytes | np.ndarray, tfs: np.ndarray
) -> list[bytes]:
    """Slice a positions blob back into its per-entry encoded byte runs
    (used by compaction: within-doc position gaps are docno-independent,
    so re-pack reuses the bytes verbatim). Vectorized boundary scan."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    head, consumed = vbyte_decode_prefix(b, 1)
    nb = int(head[0])
    _, skip = vbyte_decode_prefix(b[consumed:], nb)
    data = b[consumed + skip:]
    tfs = tfs.astype(np.int64)
    if data.size == 0:
        return [b""] * tfs.size
    val_ends = np.nonzero((data & _CONT) == 0)[0]  # end byte of each value
    entry_last_val = np.cumsum(tfs) - 1
    entry_byte_ends = val_ends[entry_last_val] + 1
    entry_byte_starts = np.concatenate(([0], entry_byte_ends[:-1]))
    raw = data.tobytes()
    return [raw[s:e] for s, e in zip(entry_byte_starts, entry_byte_ends)]


def decode_blocks(
    blob: bytes | np.ndarray, meta: PostingMeta, block_idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only the selected blocks → (docnos, tfs, dls). Loops over the
    (already pruned, small) selected block set; numpy inside."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    offs = meta.block_data_offsets()
    cnts = meta.block_counts()
    doc_parts, tf_parts, dl_parts = [], [], []
    for i in np.asarray(block_idx, dtype=np.int64):
        cnt = int(cnts[i])
        vals = vbyte_decode(b[offs[i] : offs[i] + int(meta.block_bytes[i])])
        deltas = vals[: cnt - 1]
        tfs = vals[cnt - 1 : 2 * cnt - 1]
        dls = vals[2 * cnt - 1 :]
        docnos = np.empty(cnt, dtype=np.uint64)
        docnos[0] = meta.block_first[i]
        if cnt > 1:
            docnos[1:] = meta.block_first[i] + np.cumsum(deltas)
        doc_parts.append(docnos)
        tf_parts.append(tfs)
        dl_parts.append(dls)
    if not doc_parts:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(doc_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )
