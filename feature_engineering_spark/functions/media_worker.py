"""Worker-side media decode/feature kernels — imports ONLY numpy/pandas/
stdlib (the project rule for anything a mapInPandas worker unpickles: a
pyspark import per Python worker is a measured ~3-4s anti-scaling floor,
see window_kernel.py).

Two container formats:
- FMM1: the deterministic fake container (magic "FMM1", BE uint16 header,
  raw frame payloads) used by the oracle-checked fixtures;
- PGM (binary P5): a REAL image format decoded by a ~25-line stdlib
  parser, so the real-codec branch is a tested code path, not a stub.
  PIL/ffmpeg would slot in at `decode_real` for formats beyond PGM.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

MAGIC = b"FMM1"


def parse_header(
    payload: bytes, use_real_codecs: bool = True
) -> tuple[int, int, int] | None:
    """(width, height, n_frames) for either container; None if undecodable.

    Real formats (PGM) are only ACCEPTED when ``use_real_codecs`` — with
    codecs disabled a P5 payload is "undecodable" (None -> null-feature
    row downstream) rather than a header that decode_frame will then
    refuse, which would kill a whole mapInPandas stage over one row."""
    if payload is None or len(payload) < 10:
        return None
    if payload[:4] == MAGIC:
        w, h, nf = struct.unpack(">HHH", payload[4:10])
        return w, h, nf
    if payload[:2] == b"P5" and use_real_codecs:
        parsed = _parse_pgm(payload)
        if parsed is not None:
            w, h, _maxval, _off = parsed
            return w, h, 1
    return None


def _parse_pgm(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a binary-PGM (P5) header: returns (w, h, maxval, data_offset).
    Handles arbitrary whitespace and '#' comment lines per the netpbm spec."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n":
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3 or pos >= n:
        return None
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    pos += 1  # exactly one whitespace byte after maxval, per spec
    if w <= 0 or h <= 0 or not (0 < maxval < 256) or pos + w * h > n:
        return None
    return w, h, maxval, pos


def decode_pgm(payload: bytes) -> np.ndarray | None:
    """Real-format decode: binary PGM (P5, maxval < 256) -> (h, w) uint8."""
    parsed = _parse_pgm(payload)
    if parsed is None:
        return None
    w, h, _maxval, off = parsed
    return np.frombuffer(payload[off : off + w * h], dtype=np.uint8).reshape(h, w)


def decode_frame(
    payload: bytes, w: int, h: int, idx: int, use_real_codecs: bool
) -> np.ndarray | None:
    """Decode one frame. FMM1 containers are directly sliceable; with
    ``use_real_codecs`` a P5 payload goes through the real PGM decoder
    (PIL/ffmpeg would be dispatched here for further formats)."""
    if payload[:4] == MAGIC:
        off = 10 + idx * w * h
        arr = np.frombuffer(payload[off : off + w * h], dtype=np.uint8)
        return arr.reshape(h, w)
    if not use_real_codecs:
        raise NotImplementedError(
            "non-FMM1 payload with use_real_codecs=False: enable real codecs "
            "or provide FMM1 containers"
        )
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    raise NotImplementedError(
        "real decode wired for PGM(P5) only; add PIL/ffmpeg dispatch in "
        "media_worker.decode_frame for other formats"
    )


def make_media_features_mapper(frame_stride: int, use_real_codecs: bool):
    """mapInPandas mapper: payload -> header + frame-sampled intensity
    stats + 8x8 nearest-neighbor resize checksum."""

    def mapper(batches):
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else None
                hdr = parse_header(payload, use_real_codecs)
                if hdr is None:
                    rows.append((int(mid), mtype, None, None, None, None,
                                 None, None, None))
                    continue
                w, h, nf = hdr
                idxs = list(range(0, nf, frame_stride))  # frame sampling
                frames = [
                    decode_frame(payload, w, h, i, use_real_codecs)
                    for i in idxs
                ]
                allpix = np.concatenate(
                    [f.ravel() for f in frames]
                ).astype("float64")
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

    return mapper


def make_media_from_ids_mapper(id_col: str):
    """mapInPandas mapper: id -> deterministic FMM1 container whose every
    byte is a closed-form function of the id (see synthesize_media_from_ids)."""

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
                        MAGIC + struct.pack(">HHH", w, h, nf) + px.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload"]
            )

    return mapper
