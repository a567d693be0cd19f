"""Multimodal column handling: opaque binary payloads + typed metadata.

Engine extension beyond the fastcatsearch3 reference (BLOB fields exist in
the reference's field model — core:ir.document [M per SURVEY.md §1] — but
no decode pipeline). Design for 100 TB:

  * payloads are opaque ``binary`` columns with a small typed metadata
    struct (modality, n_bytes, magic) extracted JVM-side — cheap, pushed
    to the scan;
  * decode / feature-extract / resize / frame-sample run as Arrow-batched
    ``mapInPandas`` kernels so bytes never round-trip through Python rows
    one at a time; partition sizing bounds per-task memory;
  * the actual codecs (PIL/ffmpeg/soundfile) are NOT available in this
    container, so the decode step is STUBBED: ``decoder('raw')`` is a
    deterministic fake (byte statistics standing in for pixels) proving
    the plumbing — schema, batching, partitioning — end to end, and any
    real codec plugs in behind the same signature.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, width int, height int,"
    " mean_byte double, feature array<float>"
)


def attach_binary(docs: DataFrame, modality: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (the sandbox's
    deterministic stand-in for real image/audio bytes): adds ``payload``
    (binary) + typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(modality).alias("modality"),
    )


def binary_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, magic_hex): JVM-side metadata extraction — the
    cheap scan-time half of the multimodal pipeline (no Python)."""
    b = attach_binary(docs)
    return b.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# decode kernels (mapInPandas — Arrow batches of raw bytes)
# ---------------------------------------------------------------------------

def _fake_decode(buf: bytes) -> tuple[int, int, float, np.ndarray]:
    """Deterministic stand-in for an image decode: derives a fake
    (width, height), the mean byte value, and an 8-dim byte-histogram
    feature from the payload bytes."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    n = arr.size
    width = int(np.sqrt(n)) or 1
    height = (n + width - 1) // width
    mean = float(arr.mean()) if n else 0.0
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    feat = (hist / max(n, 1)).astype(np.float32)
    return width, height, mean, feat


def _pil_decode(buf: bytes) -> tuple[int, int, float, np.ndarray]:
    """Real image decode behind the same signature as ``_fake_decode``:
    (width, height, mean pixel value, 8-bin luminance histogram). Only
    the ``Image.open`` call is per-row; stats are numpy over the decoded
    array. Import is deferred to call time — this function is only ever
    returned by ``decoder('image')`` after the probe succeeded."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(buf)) as im:
        arr = np.asarray(im.convert("L"), dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    n = max(arr.size, 1)
    return (
        int(im.width),
        int(im.height),
        float(arr.mean()) if arr.size else 0.0,
        (hist / n).astype(np.float32),
    )


def codec_available(kind: str) -> bool:
    """Probe for the codec library backing ``decoder(kind)`` without
    importing it into the hot path: image → PIL (Pillow); audio →
    soundfile; video → a PyAV/ffmpeg binding. Probed at registry time so
    a cluster image that ships the library gets the real decoder with no
    code change, and a container without it (like this sandbox — probe
    verified absent for all three) degrades to an explicit
    NotImplementedError instead of a silent fake."""
    import importlib.util

    mod = {"image": "PIL", "audio": "soundfile", "video": "av"}.get(kind)
    return mod is not None and importlib.util.find_spec(mod) is not None


def decoder(kind: str = "raw") -> Callable[[bytes], tuple]:
    """Decoder registry. 'raw' = deterministic fake (always available and
    oracle-checkable); 'image' returns a real PIL-backed decode when
    Pillow is importable (``codec_available``), else — as for
    'audio'/'video', whose libraries are absent here — a callable that
    raises NotImplementedError at call time, by design."""
    if kind == "raw":
        return _fake_decode
    if kind == "image" and codec_available("image"):
        return _pil_decode

    def _missing(buf: bytes) -> tuple:
        raise NotImplementedError(
            f"{kind} decoding needs a codec library (PIL/soundfile/ffmpeg) "
            "that is not installed in this environment; plug one in behind "
            "decoder('<kind>') — the Spark-side plumbing is identical."
        )

    return _missing


def _raw_batch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-batch vectorized 'raw' decode: ONE concatenated byte buffer +
    per-row offsets; per-row stats via reduceat/bincount — no per-row
    Python loop. This is the template a real codec kernel should follow
    for everything that is NOT the codec call itself (sizes, offsets,
    histograms, feature assembly)."""
    bufs = [bytes(p) for p in pdf["payload"]]
    lens = np.fromiter((len(b) for b in bufs), np.int64, count=len(bufs))
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    n = np.maximum(lens, 1)

    width = np.sqrt(lens.astype(np.float64)).astype(np.int64)
    width = np.maximum(width, 1)
    height = (lens + width - 1) // width

    cs = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
    ends = starts + lens
    sums = cs[ends] - cs[starts]
    mean = sums / n

    # 8-bin byte histogram per row in one bincount: bin = row*8 + byte>>5
    row_idx = np.repeat(np.arange(len(bufs), dtype=np.int64), lens)
    hist = np.bincount(
        row_idx * 8 + (flat >> 5), minlength=len(bufs) * 8
    ).reshape(len(bufs), 8)
    feat = (hist / n[:, None]).astype(np.float32)

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(np.int64),
            "modality": pdf["modality"].to_numpy(object),
            "n_bytes": lens,
            "width": width.astype(np.int32),
            "height": height.astype(np.int32),
            "mean_byte": np.where(lens > 0, mean, 0.0),
            "feature": list(feat),
        }
    )


RESIZE_SCHEMA = "doc_id bigint, out_w int, out_h int, pixels array<int>"


def resize(docs: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor resize of the fake-decoded byte image to a fixed
    (out_w × out_h) grid — the multimodal pipeline's image-resize stage.
    The source 'image' is the decode stub's (width, height) byte matrix
    (width = ⌊√n⌋, row-major, last row ragged); sampling clamps into the
    payload like a real resampler clamps at the image border. The kernel
    is whole-batch vectorized: one gather per batch, no per-row Python.
    A real codec's resize plugs in behind the same (payload → pixel grid)
    signature."""
    if out_w < 1 or out_h < 1:
        raise ValueError("resize target must be at least 1x1")
    b = attach_binary(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(x) for x in bufs), np.int64, count=len(bufs))
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            width = np.maximum(np.sqrt(lens.astype(np.float64)).astype(np.int64), 1)
            height = (lens + width - 1) // width
            # (R, out_h) source rows and (R, out_w) source cols
            r_src = (np.arange(out_h, dtype=np.int64)[None, :] * height[:, None]) // out_h
            c_src = (np.arange(out_w, dtype=np.int64)[None, :] * width[:, None]) // out_w
            idx = r_src[:, :, None] * width[:, None, None] + c_src[:, None, :]
            idx = np.minimum(idx, np.maximum(lens - 1, 0)[:, None, None])
            if flat.size:
                # clamp the GLOBAL gather index too: an empty payload that
                # is not the first row would otherwise index one past its
                # own (empty) slice — i.e. flat.size when it is last
                gidx = np.minimum(
                    (starts[:, None, None] + idx).reshape(len(bufs), -1),
                    flat.size - 1,
                )
                px = flat[gidx]
            else:
                px = np.zeros((len(bufs), out_h * out_w), np.uint8)
            px = px.reshape(len(bufs), -1).astype(np.int32)
            px[lens == 0] = 0
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "out_w": np.int32(out_w),
                    "out_h": np.int32(out_h),
                    "pixels": list(px),
                }
            )

    return b.mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_len int, byte_sum bigint"
)


def frame_sample(
    docs: DataFrame, frame_bytes: int = 64, every: int = 4
) -> DataFrame:
    """Video-style frame sampling over the opaque payload: the byte stream
    is cut into fixed-size frames and every ``every``-th frame is emitted
    with its length and byte checksum (the stub's stand-in for a decoded
    frame feature). One row per SAMPLED frame — the explode happens after
    sampling, so row amplification is n_frames/every, not n_frames.
    Ragged per-row frame counts are handled with repeat/cumsum indexing —
    no per-row Python loop; a real demuxer plugs in behind the same
    (payload → frames) signature."""
    if frame_bytes < 1 or every < 1:
        raise ValueError("frame_bytes and every must be >= 1")
    b = attach_binary(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(x) for x in bufs), np.int64, count=len(bufs))
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            cs = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
            n_frames = (lens + frame_bytes - 1) // frame_bytes
            counts = (n_frames + every - 1) // every  # sampled per row
            total = int(counts.sum())
            if total == 0:
                continue
            row = np.repeat(np.arange(len(bufs), dtype=np.int64), counts)
            offs = np.concatenate(([0], np.cumsum(counts[:-1])))
            ordinal = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
            fi = ordinal * every
            fstart = starts[row] + fi * frame_bytes
            fend = np.minimum(fstart + frame_bytes, starts[row] + lens[row])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64)[row],
                    "frame_idx": fi.astype(np.int32),
                    "frame_len": (fend - fstart).astype(np.int32),
                    "byte_sum": cs[fend] - cs[fstart],
                }
            )

    return b.mapInPandas(kernel, FRAME_SCHEMA)


def extract_features(
    docs: DataFrame, kind: str = "raw", batch_limit: int | None = None
) -> DataFrame:
    """Decode + feature-extract every payload via an Arrow-batched
    mapInPandas kernel. Returns FEATURE_SCHEMA rows.

    The 'raw' path is fully batch-vectorized (_raw_batch_kernel); other
    kinds fall back to a per-row decoder call — inherent to real codecs —
    while all surrounding work stays batch-shaped. ``docs`` may be either
    a (doc_id, text) relation (payload derived via ``attach_binary``) or
    an already-attached (doc_id, payload, modality) relation carrying
    real encoded bytes."""
    dec = decoder(kind)
    b = docs if "payload" in docs.columns else attach_binary(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if kind == "raw":
                yield _raw_batch_kernel(pdf)
                continue
            rows = []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                buf = bytes(payload)
                width, height, mean, feat = dec(buf)
                rows.append(
                    (int(doc_id), modality, len(buf), width, height, mean, feat)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "modality", "n_bytes", "width", "height",
                    "mean_byte", "feature",
                ],
            )

    out = b.mapInPandas(kernel, FEATURE_SCHEMA)
    return out.limit(batch_limit) if batch_limit else out
