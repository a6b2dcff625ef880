"""Multimodal binary-column operators (task mandate: image/audio/video as
opaque ``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample as pandas-UDF pipelines over ``mapInPandas``).

What is REAL vs STUBBED in this sandbox (no PIL/ffmpeg/soundfile baked in):

- image resize: REAL — hand-rolled PPM/PNG codecs (profet_spark.imaging)
  plus a deterministic nearest-neighbor resample in numpy.
- video frame sampling: REAL for the ``rawvid`` container defined here
  (length-prefixed PPM frames — the deterministic fake the task allows);
  real codecs (``mp4``/``webm``) raise NotImplementedError at the decode
  registry, with the Spark-side plumbing (schema, explode shape, bounded
  Arrow batches) identical either way.
- audio features: REAL for PCM WAV (stdlib ``wave``); compressed codecs
  (``mp3``/``ogg``) raise NotImplementedError at the registry.

Scale notes: every operator is an iterator-of-batches ``mapInPandas``
(U3) so per-batch decoder state amortizes and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the bytes held
per batch; frame sampling EXPLODES rows (one per kept frame), so output
partitions stay narrow — keep frame payloads, not whole videos, past the
operator. Nothing here shuffles; Catalyst prunes the binary columns away
from any downstream plan that doesn't touch them.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from profet_spark import imaging

# ------------------------------------------------------------------ image


def _resize_nn(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: index = floor(i*src/dst)."""
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[rows][:, cols]


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PPM, lossless).
    Output replaces (bytes, w, h, fmt); all other columns pass through."""
    other = [c for c in df.columns if c not in (bytes_col, "w", "h", fmt_col)]
    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in other]
        + [f"{bytes_col} binary", "w int", "h int", f"{fmt_col} string"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_bytes = []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                arr = imaging.decode(_payload(data, 'resize_images'), fmt)
                out_bytes.append(imaging.encode_ppm(_resize_nn(arr, out_w, out_h)))
            res = pdf[other].copy()
            res[bytes_col] = out_bytes
            res["w"] = np.int32(out_w)
            res["h"] = np.int32(out_h)
            res[fmt_col] = "ppm"
            yield res

    return df.mapInPandas(kernel, schema)


# ------------------------------------------------------------------ video

def _payload(data, where: str) -> bytes:
    """NULL-payload guard for every decode kernel: bytes(None) raises an
    opaque TypeError deep in the pandas worker — name the problem and the
    remedy instead."""
    if data is None:
        raise ValueError(
            f"{where}: NULL payload bytes — filter or impute missing "
            "payloads upstream (e.g. .where(col.isNotNull()))")
    return bytes(data)


RAWVID_MAGIC = b"RAWVID1\x00"


def encode_rawvid(frames: list[np.ndarray]) -> bytes:
    """The deterministic sandbox container: magic, frame count, then
    length-prefixed PPM frames."""
    parts = [RAWVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        blob = imaging.encode_ppm(f)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def _decode_rawvid(data: bytes) -> list[bytes]:
    if data[:8] != RAWVID_MAGIC:
        raise ValueError("not a rawvid container")
    (n,) = struct.unpack_from("<I", data, 8)
    off, out = 12, []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        out.append(data[off:off + ln])
        off += ln
    return out


def _video_frames(data: bytes, fmt: str) -> tuple[list[bytes], str]:
    """Decode registry: returns (encoded frames, frame format) of a
    container — the frame format comes from the decoder, so a plugged-in
    codec emitting JPEG frames is labeled correctly downstream. Real
    codecs need ffmpeg-class libs this sandbox doesn't carry — they fail
    loudly here; the operator plumbing above/below them is identical."""
    if fmt == "rawvid":
        return _decode_rawvid(data), "ppm"
    raise NotImplementedError(
        f"video codec {fmt!r}: no decoder in this environment "
        "(plug ffmpeg/pyav into _video_frames)")


def sample_video_frames(df: DataFrame, every_n: int = 2,
                        bytes_col: str = "video", fmt_col: str = "fmt",
                        id_col: str = "video_id") -> DataFrame:
    """Frame-sample: one output row per kept frame (indices 0, n, 2n, …),
    carrying (video_id, frame_idx, frame_bytes, frame_fmt). Bounded Arrow
    batches hold whole videos; output rows hold single frames."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, frame_bytes binary, frame_fmt string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = {id_col: [], "frame_idx": [], "frame_bytes": [], "frame_fmt": []}
            for vid, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                frames, ffmt = _video_frames(
                    _payload(data, "sample_video_frames"), fmt)
                for i in range(0, len(frames), every_n):
                    res[id_col].append(vid)
                    res["frame_idx"].append(i)
                    res["frame_bytes"].append(frames[i])
                    res["frame_fmt"].append(ffmt)
            yield pd.DataFrame(res)

    return df.mapInPandas(kernel, schema)


# ------------------------------------------------------------------ audio


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono PCM16 WAV via stdlib wave — the deterministic audio fixture."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.clip(samples, -32768, 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _audio_samples(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "wav":
        import io
        import wave
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise ValueError("wav decoder supports 16-bit mono PCM only")
            raw = w.readframes(w.getnframes())
            return np.frombuffer(raw, dtype="<i2").astype(np.float64), w.getframerate()
    raise NotImplementedError(
        f"audio codec {fmt!r}: no decoder in this environment "
        "(plug soundfile/librosa into _audio_samples)")


def add_audio_features(df: DataFrame, bytes_col: str = "audio",
                       fmt_col: str = "fmt") -> DataFrame:
    """Per-row audio descriptors: duration, RMS, peak, zero-crossing rate.
    Exact integer-derived math on PCM samples (float64 sums of int16
    values — deterministic at these magnitudes)."""
    other = [c for c in df.columns if c != bytes_col]
    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in other]
        + ["duration_s double", "rms double", "peak double", "zcr double"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cols = {k: [] for k in ("duration_s", "rms", "peak", "zcr")}
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                s, rate = _audio_samples(_payload(data, 'add_audio_features'), fmt)
                n = len(s)
                cols["duration_s"].append(n / rate if rate else 0.0)
                cols["rms"].append(float(np.sqrt((s * s).sum() / n)) if n else 0.0)
                cols["peak"].append(float(np.abs(s).max()) if n else 0.0)
                cols["zcr"].append(
                    float((np.signbit(s[1:]) != np.signbit(s[:-1])).sum() / (n - 1))
                    if n > 1 else 0.0)
            res = pdf[other].copy()
            for k, v in cols.items():
                res[k] = v
            yield res

    return df.mapInPandas(kernel, schema)
