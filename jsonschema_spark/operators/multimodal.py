"""Multimodal column operators: image/audio/video as opaque binary + metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition behavior) is
real and tested; the codec layer handles png/bmp/raw natively (own codecs —
no PIL in this environment) and STUBS formats that need external libraries
behind ``NotImplementedError`` with a deterministic-fake escape hatch for
tests (task directive: make the plumbing real, stub the exotic decode).

All operators are ``mapInPandas`` over Arrow batches — the binary payload
crosses the JVM↔Python boundary once per batch, never per row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import imagecodecs as codecs

NATIVE_FMTS = {"png", "bmp", "raw"}

FEATURES_SCHEMA = (
    "image_id string, fmt string, width int, height int, "
    "mean_r double, mean_g double, mean_b double, std_gray double, ok boolean, err string"
)


def _decode(b: bytes, fmt: str, w: int, h: int, fake_exotic: bool) -> np.ndarray:
    if fmt in NATIVE_FMTS:
        return codecs.decode(b, fmt, w, h)
    if fake_exotic:
        # deterministic fake for jpeg/webp/etc: derive pixels from the payload
        rng = np.frombuffer(b[: w * h * 3], dtype=np.uint8)
        if rng.size < w * h * 3:
            rng = np.resize(rng, w * h * 3)
        return rng.reshape(h, w, 3)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} needs an external codec library (not in this "
        "environment); pass fake_exotic=True for a deterministic stand-in"
    )


def image_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    fake_exotic: bool = False,
) -> DataFrame:
    """Decode + per-channel feature extraction (mean RGB, gray stddev).

    The ``raw`` rows of each Arrow batch are processed as ONE numpy pass
    (concatenated payload buffer + ``np.add.reduceat`` over per-row
    offsets) — no per-row Python on that path. png/bmp rows go through the
    per-row pure-Python codec loop, which is irreducible here (no
    vectorized decoder exists in this environment)."""

    def _raw_features(ids, fmts, payloads, ws, hs, rows):
        """Vectorized feature extraction for fixed-layout RGB payloads."""
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        expect = ws.astype(np.int64) * hs.astype(np.int64) * 3
        good = (sizes == expect) & (expect > 0)
        if good.any():
            flat = np.frombuffer(
                b"".join(p for p, g in zip(payloads, good) if g), dtype=np.uint8
            ).astype(np.float64)
            seg = expect[good]
            npx = (seg // 3).astype(np.float64)
            gstarts = np.concatenate(([0], np.cumsum(seg // 3)[:-1]))
            # channel sums: RGB interleaved stride-3 — reduceat per channel
            csum = [np.add.reduceat(flat[c::3], gstarts) for c in range(3)]
            gray = (flat[0::3] + flat[1::3] + flat[2::3]) / 3.0
            gsum = np.add.reduceat(gray, gstarts)
            gsq = np.add.reduceat(gray * gray, gstarts)
            gmean = gsum / npx
            gstd = np.sqrt(np.maximum(gsq / npx - gmean * gmean, 0.0))
            k = 0
            for j, g in enumerate(good):
                if not g:
                    continue
                rows.append((ids[j], fmts[j], int(ws[j]), int(hs[j]),
                             float(csum[0][k] / npx[k]), float(csum[1][k] / npx[k]),
                             float(csum[2][k] / npx[k]), float(gstd[k]), True, None))
                k += 1
        for j, g in enumerate(good):
            if not g:
                err = ("empty image" if expect[j] == 0
                       else f"payload size {sizes[j]} != {expect[j]}")
                rows.append((ids[j], fmts[j], int(ws[j]), int(hs[j]),
                             None, None, None, None, False, err))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            fmt_v = b[fmt_col].to_numpy()
            vectorizable = (fmt_v == "raw") | (fake_exotic & ~np.isin(fmt_v, list(NATIVE_FMTS)))
            vec = b[vectorizable]
            if len(vec):
                payloads = [bytes(x) for x in vec[bytes_col]]
                ws, hs = vec[w_col].to_numpy(), vec[h_col].to_numpy()
                if fake_exotic:
                    # fake-exotic payloads resize to w*h*3 deterministically
                    payloads = [
                        p if len(p) == w * h * 3 else bytes(np.resize(
                            np.frombuffer(p[: w * h * 3], dtype=np.uint8), w * h * 3))
                        for p, w, h in zip(payloads, ws.astype(int), hs.astype(int))
                    ]
                _raw_features(vec[id_col].to_list(), vec[fmt_col].to_list(),
                              payloads, ws, hs, rows)
            for r in b[~vectorizable].itertuples(index=False):
                rid, fmt = getattr(r, id_col), getattr(r, fmt_col)
                w, h = int(getattr(r, w_col)), int(getattr(r, h_col))
                try:
                    px = _decode(bytes(getattr(r, bytes_col)), fmt, w, h, fake_exotic)
                    gray = px.mean(axis=2)
                    rows.append((rid, fmt, px.shape[1], px.shape[0],
                                 float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
                                 float(px[:, :, 2].mean()), float(gray.std()), True, None))
                except Exception as e:  # noqa: BLE001 — error column, not crash
                    rows.append((rid, fmt, w, h, None, None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "width", "height", "mean_r", "mean_g", "mean_b",
                "std_gray", "ok", "err"])

    cols = [id_col, bytes_col, fmt_col, w_col, h_col]
    return df.select(*cols).mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images(
    df: DataFrame, target_w: int, target_h: int,
    bytes_col: str = "bytes", fmt_col: str = "fmt", id_col: str = "image_id",
    w_col: str = "w", h_col: str = "h", fake_exotic: bool = False,
) -> DataFrame:
    """Nearest-neighbor resize (numpy index sampling), re-encoded as PNG."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                px = _decode(bytes(getattr(r, bytes_col)), getattr(r, fmt_col),
                             int(getattr(r, w_col)), int(getattr(r, h_col)), fake_exotic)
                ys = (np.arange(target_h) * px.shape[0]) // target_h
                xs = (np.arange(target_w) * px.shape[1]) // target_w
                out = px[np.ix_(ys, xs)]
                rows.append((getattr(r, id_col), codecs.png_encode(out),
                             target_w, target_h, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select(id_col, bytes_col, fmt_col, w_col, h_col).mapInPandas(
        run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id string, frame_idx int, bytes binary"


def sample_video_frames(
    df: DataFrame, every_k: int = 10,
    bytes_col: str = "bytes", id_col: str = "media_id",
    w_col: str = "w", h_col: str = "h", n_frames_col: str = "n_frames",
    container: str = "rawvideo",
) -> DataFrame:
    """Frame sampling: one input row (video payload) → one output row per
    sampled frame (row-multiplying mapInPandas, Arrow-batched).

    ``container="rawvideo"`` (concatenated w×h×3 RGB frames) is demuxed
    natively — the full Spark plumbing is real and tested. Real containers
    (mp4/webm) need an external demux library which is not in this
    environment — STUB behind NotImplementedError (task directive)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if container != "rawvideo":
                raise NotImplementedError(
                    f"container {container!r} demux requires an external "
                    "library (e.g. PyAV); only 'rawvideo' is native here"
                )
            # vectorized demux plan: per-batch numpy computes every
            # (row, frame_idx, byte offset) triple — no per-row Python loop
            ns = b[n_frames_col].to_numpy(dtype=np.int64)
            fsz = b[w_col].to_numpy(dtype=np.int64) * b[h_col].to_numpy(dtype=np.int64) * 3
            per_row = (ns + every_k - 1) // every_k          # frames sampled per row
            row_of = np.repeat(np.arange(len(b)), per_row)    # output row -> input row
            # frame index within each row: global arange minus each row's base
            base = np.repeat(np.concatenate(([0], np.cumsum(per_row)[:-1])), per_row)
            fidx = (np.arange(row_of.size) - base) * every_k
            starts = fidx * fsz[row_of]
            ids = b[id_col].to_numpy()
            payloads = b[bytes_col].to_list()
            frames = [
                bytes(payloads[r][s:s + z])
                for r, s, z in zip(row_of, starts, fsz[row_of])
            ]
            yield pd.DataFrame({
                "media_id": ids[row_of], "frame_idx": fidx.astype("int32"),
                "bytes": frames,
            })

    return df.select(id_col, bytes_col, w_col, h_col, n_frames_col).mapInPandas(
        run, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = "media_id string, n_samples long, rms double, ok boolean, err string"


def audio_features(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "media_id",
    fake_pcm: bool = False,
) -> DataFrame:
    """Audio feature plumbing. Real path would parse WAV/FLAC; here the
    payload is treated as 16-bit PCM when ``fake_pcm`` (deterministic fake),
    else the stub error is captured per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                rid = getattr(r, id_col)
                if fake_pcm:
                    pcm = np.frombuffer(bytes(getattr(r, bytes_col)), dtype="<i2")
                    rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if pcm.size else 0.0
                    rows.append((rid, int(pcm.size), rms, True, None))
                else:
                    rows.append((rid, 0, None, False,
                                 "audio decode requires an external library"))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "rms", "ok", "err"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_SCHEMA)
