"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the build brief): image/audio/video travel as `binary` columns
with a typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched Pandas functions over mapInPandas, so each Python worker
processes a columnar batch (not a row) and the exchange is Arrow both ways.

The heavy codec libraries (PIL/librosa/av) are NOT in this container, so the
decoders implement the UNCOMPRESSED formats those libraries would delegate
to anyway — pure numpy byte-level parsers, no stubs:

- **BMP**  (24-bit BITMAPINFOHEADER): header parse + bottom-up padded-row
  pixel decode -> width/height/channels/mean intensity.
- **WAV**  (RIFF PCM16): chunk walk (fmt /data) -> sample rate/channels/
  frames/duration + RMS over the actual samples.
- **PPM**  (P6): ASCII header + raw RGB; a "video" is a concatenation of P6
  frames, which frame_sample() walks, decoding every Nth frame.

Compressed formats (JPEG/MP3/H.264) raise a clear error naming the library
they need — the dispatch, schema, batching and partitioning do not change
when a real codec is dropped in.

At scale: mapInPandas is a narrow transformation (no shuffle); repartition
upstream by size so one batch of decoded frames fits executor memory
(`media_repartition` sizes this).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


# ---------------------------------------------------------------------------
# encoders (test/fixture synthesis — byte-faithful files, not mocks)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, intensity: int) -> bytes:
    """A real 24-bit BMP: 54-byte headers + bottom-up rows padded to 4 bytes,
    every pixel (intensity, intensity, intensity)."""
    row = width * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rowbytes = bytes([intensity] * row) + b"\x00" * pad
    return header + info + rowbytes * height


def encode_wav(sample_rate: int, n_frames: int, amplitude: int, n_channels: int = 1) -> bytes:
    """A real RIFF/WAVE PCM16 file: fmt + data chunks, a square wave of
    +/-amplitude (so RMS == amplitude exactly)."""
    samples = np.empty(n_frames * n_channels, dtype="<i2")
    samples[0::2] = amplitude
    samples[1::2] = -amplitude
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def encode_ppm(width: int, height: int, intensity: int) -> bytes:
    """A real binary PPM (P6) frame, every pixel gray `intensity`."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes([intensity] * (width * height * 3))


def encode_ppm_video(width: int, height: int, intensities: list[int]) -> bytes:
    """'Video' container: concatenated P6 frames (what frame_sample walks)."""
    return b"".join(encode_ppm(width, height, i) for i in intensities)


# ---------------------------------------------------------------------------
# decoders (numpy byte-level parsers)
# ---------------------------------------------------------------------------


def _decode_bmp(b: bytes) -> tuple[int, int, int, float]:
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp={bpp} (24-bit only without a codec lib)")
    row = width * 3
    stride = row + (4 - row % 4) % 4
    px = np.frombuffer(b, dtype=np.uint8, count=stride * abs(height), offset=data_offset)
    px = px.reshape(abs(height), stride)[:, :row]  # strip row padding
    return width, abs(height), 3, float(px.mean())


def _decode_ppm(b: bytes, offset: int = 0) -> tuple[int, int, int, float, int]:
    """-> (width, height, channels, mean, next_offset) — next_offset supports
    walking concatenated frames."""
    if b[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = three whitespace-separated tokens after the magic
    i, tokens = offset + 2, []
    while len(tokens) < 3:
        while b[i : i + 1].isspace():
            i += 1
        j = i
        while not b[j : j + 1].isspace():
            j += 1
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, _maxval = tokens
    n = width * height * 3
    px = np.frombuffer(b, dtype=np.uint8, count=n, offset=i)
    return width, height, 3, float(px.mean()), i + n


def _decode_wav(b: bytes) -> tuple[int, int, int, float, float]:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        if cid == b"fmt ":
            _fmt, n_ch, rate = struct.unpack_from("<HHI", b, pos + 8)
            bits = struct.unpack_from("<H", b, pos + 22)[0]
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bits={bits} (PCM16 only without a codec lib)")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    n_frames = len(samples) // n_ch
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    return rate, n_ch, n_frames, n_frames / rate, rms


# ---------------------------------------------------------------------------
# media construction
# ---------------------------------------------------------------------------


def as_media(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Wrap any table into the media schema (payload bytes = encoded text)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def synthesize_bmp_media(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Deterministic BMP fixture: per row, a real (len%13+4) x (len%7+4)
    24-bit BMP filled with intensity id%256 — encode runs in the same
    Arrow-batched kernel shape as decode (len = octet_length(payload))."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                blen = len(payload.encode("utf-8"))
                out.append(encode_bmp(blen % 13 + 4, blen % 7 + 4, int(mid) % 256))
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "content": out,
                    "meta": [
                        {"mime": "image/bmp", "byte_len": len(c), "source": "synthetic"} for c in out
                    ],
                }
            )

    return docs.select(id_col, payload_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthesize_wav_media(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Deterministic WAV fixture: 8kHz PCM16 square wave, len%4000+100
    frames, amplitude id%2000+1 (RMS == amplitude exactly)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                blen = len(payload.encode("utf-8"))
                out.append(encode_wav(8000, blen % 4000 + 100, int(mid) % 2000 + 1))
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "content": out,
                    "meta": [
                        {"mime": "audio/wav", "byte_len": len(c), "source": "synthetic"} for c in out
                    ],
                }
            )

    return docs.select(id_col, payload_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def synthesize_ppm_video_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'video' fixture: id%4+2 concatenated P6 frames of
    (id%5+2) x (id%3+2), frame f filled with intensity (id+f)%256."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid in batch[id_col]:
                mid = int(mid)
                out.append(
                    encode_ppm_video(
                        mid % 5 + 2, mid % 3 + 2, [(mid + f) % 256 for f in range(mid % 4 + 2)]
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "content": out,
                    "meta": [
                        {"mime": "video/x-ppm-seq", "byte_len": len(c), "source": "synthetic"}
                        for c in out
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def media_repartition(media: DataFrame, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """Repartition so decoded batches stay memory-bounded. With real media a
    partition holds ~target_batch_bytes of payload; here we approximate via
    row counts (payloads are small)."""
    return media.repartition("media_id")


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------


def decode_images(media: DataFrame) -> DataFrame:
    """binary -> (format, width, height, channels, mean intensity) via
    mapInPandas. BMP and PPM decode for real (numpy parsers above); other
    magic bytes yield format='unknown' with null dimensions rather than
    failing the batch (bad files are data, not bugs, at 100 TB)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                rec = {"media_id": mid, "format": "unknown", "width": None,
                       "height": None, "n_channels": None, "mean_intensity": None}
                try:
                    if b and b[:2] == b"BM":
                        w, h, c, m = _decode_bmp(b)
                        rec.update(format="bmp", width=w, height=h, n_channels=c, mean_intensity=m)
                    elif b and b[:2] == b"P6":
                        w, h, c, m, _ = _decode_ppm(b)
                        rec.update(format="ppm", width=w, height=h, n_channels=c, mean_intensity=m)
                except ValueError:
                    pass  # malformed header -> stays 'unknown'
                rows.append(rec)
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["n_channels"] = out["n_channels"].astype("Int32")
            yield out

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


def decode_audio(media: DataFrame) -> DataFrame:
    """binary -> (sample_rate, channels, frames, duration, RMS) for RIFF
    PCM16 payloads; non-WAV rows come back null-metered."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                rec = {"media_id": mid, "sample_rate": None, "n_channels": None,
                       "n_frames": None, "duration_sec": None, "rms": None}
                try:
                    if b and b[:4] == b"RIFF":
                        rate, ch, nf, dur, rms = _decode_wav(b)
                        rec.update(sample_rate=rate, n_channels=ch, n_frames=nf,
                                   duration_sec=dur, rms=rms)
                except ValueError:
                    pass
                rows.append(rec)
            out = pd.DataFrame(rows)
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["n_channels"] = out["n_channels"].astype("Int32")
            out["n_frames"] = out["n_frames"].astype("Int64")
            yield out

    return media.mapInPandas(kernel, schema=AUDIO_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """binary -> fixed-dim float feature vector (byte-histogram baseline
    featurizer folded to FEATURE_DIM; a neural featurizer would slot into
    the same kernel signature)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = []
            for b in batch["content"]:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": batch["media_id"], "features": feats})

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """PPM-sequence video -> one row per SAMPLED frame (frame 0, n, 2n, ...),
    decoded for real. Compressed video would swap the per-frame parser for a
    codec call; the explode contract and batching stay identical."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                if not b or b[:2] != b"P6":
                    continue
                offset, frame_no = 0, 0
                while offset < len(b):
                    w, h, _c, m, offset = _decode_ppm(b, offset)
                    if frame_no % every_n == 0:
                        rows.append(
                            {"media_id": mid, "frame_no": frame_no, "width": w,
                             "height": h, "mean_intensity": m}
                        )
                    frame_no += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "width", "height", "mean_intensity"]
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _bmp_pixels(b: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 (bottom-up row order preserved; resize doesn't
    care about vertical orientation and re-encoding keeps it)."""
    data_offset = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    if struct.unpack_from("<H", b, 28)[0] != 24:
        raise ValueError("24-bit only")
    row = width * 3
    stride = row + (4 - row % 4) % 4
    px = np.frombuffer(b, dtype=np.uint8, count=stride * abs(height), offset=data_offset)
    return px.reshape(abs(height), stride)[:, :row].reshape(abs(height), width, 3)


def _encode_bmp_pixels(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> real 24-bit BMP bytes (rows padded to 4)."""
    h, w, _ = arr.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = arr.reshape(h, row)
        body = padded.tobytes()
    else:
        body = arr.tobytes()
    return header + info + body


def _ppm_pixels(b: bytes) -> np.ndarray:
    w, h, _c, _mean, next_off = _decode_ppm(b)
    start = next_off - w * h * 3
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=start)
    return px.reshape(h, w, 3)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of BMP/PPM payloads to (width, height),
    re-encoded as real BMP bytes — the preprocessing step that normalizes a
    scraped image corpus to one model input size. mapInPandas, NARROW (no
    shuffle): each Arrow batch decodes, index-samples rows/cols with numpy
    (vectorized gather, no Python pixel loops), re-encodes. Non-image rows
    pass through with null content instead of failing the batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                rec = {"media_id": mid, "format": "unknown", "width": None,
                       "height": None, "content": None}
                try:
                    if b and b[:2] == b"BM":
                        px, fmt = _bmp_pixels(b), "bmp"
                    elif b and b[:2] == b"P6":
                        px, fmt = _ppm_pixels(b), "ppm"
                    else:
                        px = None
                    if px is not None:
                        h0, w0, _ = px.shape
                        ys = (np.arange(height) * h0) // height
                        xs = (np.arange(width) * w0) // width
                        out_px = px[ys][:, xs]
                        rec.update(format=fmt, width=width, height=height,
                                   content=_encode_bmp_pixels(np.ascontiguousarray(out_px)))
                except ValueError:
                    pass
                rows.append(rec)
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "media_id long, chunk_no int, start_sec double, end_sec double, "
    "n_frames long, rms double, peak double"
)


def audio_chunks(media: DataFrame, window_sec: float = 0.5) -> DataFrame:
    """Fixed-window audio chunking: one output row per `window_sec` slice of
    each PCM16 WAV payload with per-chunk RMS and peak — the segmentation
    primitive an ASR/audio-training pipeline runs before feature extraction
    (VAD thresholds on the RMS column downstream). mapInPandas expands rows
    (1 -> n_chunks), still narrow — no shuffle; per-batch numpy reshape does
    the windowing in one vectorized pass per file."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                try:
                    if not (b and b[:4] == b"RIFF"):
                        continue
                    rate, n_ch, _nf, _dur, _rms = _decode_wav(b)
                except ValueError:
                    continue
                # re-decode the sample array (decode helper returns scalars)
                pos, data = 12, None
                while pos + 8 <= len(b):
                    cid, size = struct.unpack_from("<4sI", b, pos)
                    if cid == b"data":
                        data = b[pos + 8 : pos + 8 + size]
                    pos += 8 + size + (size % 2)
                samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
                if n_ch > 1:  # mixdown for metering
                    samples = samples[: len(samples) // n_ch * n_ch]
                    samples = samples.reshape(-1, n_ch).mean(axis=1)
                win = max(1, int(round(window_sec * rate)))
                n_chunks = (len(samples) + win - 1) // win
                for c in range(n_chunks):
                    seg = samples[c * win : (c + 1) * win]
                    rows.append(
                        {
                            "media_id": mid,
                            "chunk_no": c,
                            "start_sec": c * win / rate,
                            "end_sec": min((c + 1) * win, len(samples)) / rate,
                            "n_frames": len(seg),
                            "rms": float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0,
                            "peak": float(np.max(np.abs(seg))) if len(seg) else 0.0,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "chunk_no", "start_sec", "end_sec",
                         "n_frames", "rms", "peak"],
            )

    return media.mapInPandas(kernel, schema=AUDIO_CHUNK_SCHEMA)


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("patch_row", T.IntegerType()),
        T.StructField("patch_col", T.IntegerType()),
        T.StructField("patch_h", T.IntegerType()),
        T.StructField("patch_w", T.IntegerType()),
        T.StructField("patch_mean", T.DoubleType()),
    ]
)


def encode_gradient_bmp(width: int, height: int, base: int) -> bytes:
    """A real 24-bit BMP whose pixel at LOGICAL (x, y) — y = 0 is the top
    row — is base + x + y on all three channels (callers keep
    base + width + height < 256 so no wrap). Rows are written bottom-up
    per the BMP spec, so a decoder that forgets the flip reads a
    vertically mirrored gradient — the asymmetry is what lets the
    patchify oracle catch orientation bugs instead of having them cancel."""
    row = width * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = b""
    for y in range(height - 1, -1, -1):  # bottom-up
        vals = bytes(v for x in range(width) for v in [base + x + y] * 3)
        body += vals + b"\x00" * pad
    return header + info + body


def synthesize_gradient_bmp_media(
    docs: DataFrame, id_col: str = "doc_id", width: int = 8, height: int = 6
) -> DataFrame:
    """One gradient BMP per doc: base = doc_id % 100 (bounded so
    base + x + y < 256 at 8x6)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch[id_col]
            out = [encode_gradient_bmp(width, height, int(i) % 100) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": out,
                    "meta": [
                        {"mime": "image/bmp", "byte_len": len(c), "source": "synthetic"}
                        for c in out
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def patchify_images(media: DataFrame, grid_rows: int = 2, grid_cols: int = 2) -> DataFrame:
    """ViT-style patch extraction: each BMP splits into a grid_rows x
    grid_cols grid of equal patches; output one row per patch with its
    pixel mean (4dp). The byte-level work — header parse, stride strip,
    BOTTOM-UP row flip to logical top-down order, channel reshape — is the
    exact plumbing a real vision featurizer sits on; swap the mean for a
    projection and this is ViT preprocessing.

    Scale shape: mapInPandas is narrow (no shuffle); the fan-out is
    grid_rows*grid_cols rows per image, emitted per Arrow batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "patch_row", "patch_col", "patch_h", "patch_w", "patch_mean"]
        for batch in batches:
            rows = []
            for mid, b in zip(batch["media_id"], batch["content"]):
                try:
                    if not b or b[:2] != b"BM":
                        continue
                    data_offset = struct.unpack_from("<I", b, 10)[0]
                    width, height = struct.unpack_from("<ii", b, 18)
                    if struct.unpack_from("<H", b, 28)[0] != 24:
                        continue
                    row = width * 3
                    stride = row + (4 - row % 4) % 4
                    px = np.frombuffer(b, np.uint8, count=stride * abs(height), offset=data_offset)
                    px = px.reshape(abs(height), stride)[:, :row]
                    if height > 0:
                        px = px[::-1]  # file is bottom-up; we index top-down
                    h, w = abs(height), width
                    ph, pw = h // grid_rows, w // grid_cols
                    img = px.reshape(h, w, 3)
                    for r in range(grid_rows):
                        for c in range(grid_cols):
                            patch = img[r * ph:(r + 1) * ph, c * pw:(c + 1) * pw, :]
                            rows.append(
                                (mid, r, c, ph, pw, round(float(patch.mean()), 4))
                            )
                except ValueError:
                    continue
            out = pd.DataFrame(rows, columns=cols)
            for ic in ("patch_row", "patch_col", "patch_h", "patch_w"):
                out[ic] = out[ic].astype("Int32")
            yield out

    return media.select("media_id", "content").mapInPandas(kernel, schema=PATCH_SCHEMA)
