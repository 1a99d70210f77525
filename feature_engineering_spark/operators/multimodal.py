"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is stubbed
(clearly marked) behind an import-try with a deterministic fake; the
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested. The fake "container format" is parseable, so header
parsing, frame sampling, and byte-level feature extraction run for real.

Fake container layout (synthesize_media):
    bytes 0-3   magic b"FMM1"
    bytes 4-5   width  (uint16 BE)
    bytes 6-7   height (uint16 BE)
    bytes 8-9   n_frames (uint16 BE)
    bytes 10-   frame payloads, width*height bytes each (deterministic)
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, codec:string>"
)

_MAGIC = b"FMM1"


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (pytest/bench fixture)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
        nf = int(rng.integers(1, 6))
        frames = rng.integers(0, 256, size=w * h * nf, dtype=np.uint8).tobytes()
        payload = _MAGIC + struct.pack(">HHH", w, h, nf) + frames
        rows.append(
            (
                i,
                ["image", "audio", "video"][i % 3],
                payload,
                {"width": w, "height": h, "n_frames": nf, "codec": "fmm1"},
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synthesize_media_from_ids(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FMM1 containers derived from an id column — the
    oracle-checkable fixture. Every byte is a closed-form function of the
    id (w = 4 + id%13, h = 4 + 3*id%13, nf = 1 + id%5, pixel[i] =
    (id*31 + i*7) % 256), so a SQL oracle can independently re-derive what
    the DECODED features must be without parsing the blob — which makes the
    whole Spark path (byte construction -> header parse -> frame sampling
    -> resize -> stats) an end-to-end checked black box."""

    def mapper(batches):
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w = 4 + did % 13
                h = 4 + (did * 3) % 13
                nf = 1 + did % 5
                n = w * h * nf
                px = ((did * 31 + np.arange(n) * 7) % 256).astype(np.uint8)
                rows.append(
                    (
                        did,
                        ["image", "audio", "video"][did % 3],
                        _MAGIC + struct.pack(">HHH", w, h, nf) + px.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload"]
            )

    return df.select(id_col).mapInPandas(
        mapper, schema="media_id long, media_type string, payload binary"
    )


def _parse_header(payload: bytes) -> tuple[int, int, int] | None:
    if payload is None or len(payload) < 10 or payload[:4] != _MAGIC:
        return None
    w, h, nf = struct.unpack(">HHH", payload[4:10])
    return w, h, nf


# Flip to route frames through a real codec (PIL/ffmpeg) once wired up.
# Import success alone must NOT change behavior: the FMM1 fake container
# decodes unconditionally; real-codec wiring is an explicit opt-in.
USE_REAL_CODECS = False


def _decode_frame(payload: bytes, w: int, h: int, idx: int) -> np.ndarray:
    """STUB boundary: a real build would hand payload bytes to
    PIL/ffmpeg here. The fake container is directly sliceable."""
    if USE_REAL_CODECS:  # pragma: no cover - no codecs in this container
        raise NotImplementedError(
            "real image decode not wired: replace _decode_frame with "
            "PIL/ffmpeg and set USE_REAL_CODECS=True when available"
        )
    off = 10 + idx * w * h
    arr = np.frombuffer(payload[off : off + w * h], dtype=np.uint8)
    return arr.reshape(h, w)


def media_features(df: DataFrame, frame_stride: int = 2) -> DataFrame:
    """Decode + per-media byte/frame features via one mapInPandas pass.

    Output: media_id, media_type, width, height, n_frames, sampled_frames,
    mean_intensity, std_intensity, resized_checksum (8x8 nearest-neighbor
    "resize" of frame 0 — the resize plumbing, real math on fake pixels).
    """
    out_schema = (
        "media_id long, media_type string, width int, height int, "
        "n_frames int, sampled_frames int, mean_intensity double, "
        "std_intensity double, resized_checksum long"
    )

    def mapper(batches):
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                hdr = _parse_header(bytes(payload))
                if hdr is None:
                    rows.append((int(mid), mtype, None, None, None, None,
                                 None, None, None))
                    continue
                w, h, nf = hdr
                idxs = list(range(0, nf, frame_stride))  # frame sampling
                frames = [_decode_frame(bytes(payload), w, h, i) for i in idxs]
                allpix = np.concatenate([f.ravel() for f in frames]).astype("float64")
                f0 = frames[0]
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                resized = f0[np.ix_(ys, xs)]
                rows.append((
                    int(mid), mtype, w, h, nf, len(idxs),
                    float(allpix.mean()), float(allpix.std()),
                    int(resized.astype("int64").sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "width", "height", "n_frames",
                    "sampled_frames", "mean_intensity", "std_intensity",
                    "resized_checksum",
                ],
            )

    # binary payloads are large: repartition so Arrow batches stay bounded
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n_parts, "media_id").mapInPandas(mapper, schema=out_schema)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — pure JVM on the struct column (no
    payload read: column pruning keeps the binary out of the scan)."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
        F.sum("meta.n_frames").alias("total_frames"),
    )
