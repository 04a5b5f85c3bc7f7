"""Multimodal columns: opaque binary payloads + typed metadata
(BASELINE.json north star).

Design: media travels as an opaque ``binary`` column with typed
metadata columns beside it; decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` so bytes move columnar (never pickled
row-at-a-time) and the pipeline shape (schema, partitioning, batch
size) is real even where the codec is stubbed.

The container has no image/audio codecs, so the decode kernel is a
clearly marked STUB: :func:`fake_decode_features` computes
deterministic byte-level features (length, checksum, head bytes) —
the Spark-side plumbing (explicit output schema, per-batch vectorized
numpy work, ``maxRecordsPerBatch`` sizing) is exactly what a real
PIL/ffmpeg kernel would use; swap `_decode_batch` and keep the plan.

Scale notes: payload bytes dominate I/O — the operators keep binary
columns OUT of shuffles (features are extracted before any
aggregation; joins carry ids, not blobs). ``repartition`` before
mapInPandas controls decode parallelism independent of file layout.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ["png", "jpeg", "wav"]

DECODE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("head_byte", LongType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """Simulate a media table: payload = utf-8 bytes of the text
    (deterministic stand-in for image/audio bytes), with typed
    metadata (format tag, payload length)."""
    payload = F.encode(F.col("text"), "UTF-8")
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        "doc_id",
        fmt.alias("media_format"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("payload_len"),
    )


def _decode_batch(pdf):
    """STUB decode kernel — replace with a real codec (PIL/librosa/
    ffmpeg) in production. Deterministic byte-level features only."""
    import numpy as np
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len)
    checksum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 65536)
    head = payloads.map(lambda b: int(b[0]) if len(b) else -1)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_format": pdf["media_format"],
            "byte_len": byte_len.astype("int64"),
            "checksum": checksum.astype("int64"),
            "head_byte": head.astype("int64"),
        }
    )


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _decode_batch(pdf)

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=DECODE_FEATURES_SCHEMA)


# Video is the one modality still on the stub kernel: audio and image
# have REAL stdlib codec tiers (decode_wav_features: RIFF/WAVE+PCM16;
# decode_png_features: zlib/struct PNG incl. all five scanline
# filters), but no pure-stdlib video container parse is worth the
# maintenance — a production deployment swaps _decode_batch for a
# codec-backed kernel with the identical mapInPandas plumbing
# (disposition recorded in PARITY.md).

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("resized", BinaryType()),
        StructField("resized_len", LongType()),
        StructField("resized_checksum", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Resize kernel over the binary column — STUB codec, real
    pipeline. The stub treats the payload as a flat byte grid and
    nearest-neighbor-samples it to ``out_w·out_h`` bytes (which IS a
    resize of the byte array — deterministic, no codec needed); a
    real kernel swaps in PIL's ``Image.resize`` and keeps everything
    else: Arrow-batched mapInPandas, explicit schema with the binary
    OUTPUT column (resized media stays opaque bytes for the next
    stage), decode parallelism controlled by ``partitions`` not file
    layout.

    Scale: output size is fixed per row (out_w·out_h), so downstream
    stages can size partitions exactly; the input blob never enters a
    shuffle — resizing happens in the scan stage.
    """
    import numpy as np
    import pandas as pd

    n_out = out_w * out_h

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            def rz(b: bytes) -> bytes:
                if not len(b):
                    return bytes(n_out)
                arr = np.frombuffer(b, dtype=np.uint8)
                # EXACT integer sampling grid (k·(L−1)) div (n−1) —
                # not float linspace+floor, whose rounded step can
                # flip a floor at integer boundaries; the integer form
                # is the same nearest-neighbor rule, bit-reproducible,
                # and lets the DuckDB oracle verify the resized
                # CONTENT via checksum (MULTIMODAL_RESIZE_SQL).
                if n_out == 1:
                    idx = np.zeros(1, dtype=np.int64)
                else:
                    idx = np.arange(n_out, dtype=np.int64) * (len(arr) - 1) // (
                        n_out - 1
                    )
                return arr[idx].tobytes()

            resized = pdf["payload"].map(rz)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized": resized,
                    "resized_len": resized.map(len).astype("int64"),
                    "resized_checksum": resized.map(
                        lambda b: int(
                            np.frombuffer(b, dtype=np.uint8).sum()
                        )
                        % 65536
                    ).astype("int64"),
                }
            )

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    every: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Frame sampling for video-shaped payloads — STUB codec, real
    pipeline. The stub chunks the payload into fixed ``frame_bytes``
    "frames" and keeps every ``every``-th (a real kernel swaps in an
    ffmpeg/pyav iterator and keeps the row-explosion shape). One input
    row fans out to ceil(len/frame_bytes)/every output rows — the
    1→N explode every frame-sampler needs, done INSIDE mapInPandas so
    only sampled frames ever materialize (never the full frame list).

    Scale: peak memory per task is one payload + its sampled frames;
    frame rows carry (id, idx, bytes) only, so the downstream shuffle
    (if any) moves exactly the sampled bytes.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, -(-len(b) // frame_bytes))
                for fi in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(b[fi * frame_bytes : (fi + 1) * frame_bytes]))
            cks = [
                int(np.frombuffer(f, dtype=np.uint8).sum()) % 65536 if f else 0
                for f in frames
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                    "frame_len": pd.Series([len(f) for f in frames], dtype="int64"),
                    "frame_checksum": pd.Series(cks, dtype="int64"),
                }
            )

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(kernel, schema=FRAME_SCHEMA)


# --- REAL codec tier: WAV/PCM via the stdlib ------------------------------
# The container ships no PIL/ffmpeg, but RIFF/WAVE + PCM16 needs only
# the standard library — so the audio modality gets a REAL codec
# (VERDICT r2 stretch #8): genuine container synthesis on the way in,
# genuine container parse + sample decode on the way out. The image/
# video kernels keep the documented stub contract.

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_width", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", LongType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)

_WAV_RATE = 8000
_WAV_SECONDS = 0.05  # 400 frames per payload — container-dominated sizes


def _synth_wav_bytes(doc_id: int) -> bytes:
    """Deterministic PCM16 mono WAV: a pure tone whose frequency is a
    function of doc_id (220 Hz + 55·(doc_id mod 16)) — every byte of
    the RIFF container is reproducible, so goldens are stable."""
    import io
    import wave

    import numpy as np

    freq = 220.0 + 55.0 * (doc_id % 16)
    n = int(_WAV_RATE * _WAV_SECONDS)
    t = np.arange(n, dtype=np.float64) / _WAV_RATE
    samples = (np.sin(2.0 * np.pi * freq * t) * 20000.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def attach_wav_audio(documents: DataFrame, partitions: int | None = None) -> DataFrame:
    """Audio twin of :func:`attach_binary` with REAL payloads: each
    doc carries a genuine WAV container (stdlib ``wave`` writer)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            payloads = pdf["doc_id"].map(lambda d: _synth_wav_bytes(int(d)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": "wav",
                    "payload": payloads,
                    "payload_len": payloads.map(len).astype("int64"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_format", StringType()),
            StructField("payload", BinaryType()),
            StructField("payload_len", LongType()),
        ]
    )
    src = documents.select("doc_id")
    src = src.repartition(partitions) if partitions else src
    return src.mapInPandas(gen, schema=schema)


def _decode_wav_batch(pdf):
    """REAL decode kernel: parse the RIFF/WAVE container with the
    stdlib ``wave`` reader, decode PCM16 samples with numpy, emit
    header fields + signal features. Integer features only (rounded
    rms/peak/crossing counts) so results are bit-stable everywhere."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    rows = []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            rate, chans, width, nframes = (
                w.getframerate(),
                w.getnchannels(),
                w.getsampwidth(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        rms = int(round(float(np.sqrt(np.mean(s * s))))) if len(s) else 0
        peak = int(np.max(np.abs(s))) if len(s) else 0
        zc = int(np.count_nonzero(np.diff(np.signbit(s)))) if len(s) > 1 else 0
        rows.append(
            (
                int(doc_id),
                rate,
                chans,
                width,
                nframes,
                int(round(1000.0 * nframes / rate)),
                rms,
                peak,
                zc,
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])


def decode_wav_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched REAL audio decode over the binary column — same
    plan shape as :func:`decode_features` (binary stays out of every
    shuffle; decode parallelism set by ``repartition``)."""

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _decode_wav_batch(pdf)

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


# --- REAL codec tier: PNG via zlib + struct -------------------------------
# PNG needs only DEFLATE (zlib), CRC32 (zlib) and chunk framing
# (struct) — all standard library. Encoder emits 8-bit RGB
# non-interlaced; decoder implements the full filter set (None/Sub/
# Up/Average/Paeth), so it reads any baseline RGB8 PNG, not just its
# own output. Video keeps the documented stub contract.

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("mean_r", LongType()),
        StructField("mean_g", LongType()),
        StructField("mean_b", LongType()),
        StructField("pixel_checksum", LongType()),
    ]
)

_PNG_SIDE = 16


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _synth_pixels(doc_id: int):
    """Deterministic RGB8 test card keyed by doc_id (exact integer
    formula — the decode test recomputes it independently)."""
    import numpy as np

    side = _PNG_SIDE
    y, x = np.mgrid[0:side, 0:side]
    r = (x * (doc_id + 1) + y) % 256
    g = (x + y * (doc_id + 1)) % 256
    b = (x * y + doc_id) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _synth_png_bytes(doc_id: int) -> bytes:
    import struct
    import zlib

    import numpy as np

    px = _synth_pixels(doc_id)
    h, w, _ = px.shape
    raw = b"".join(
        b"\x00" + px[row].tobytes() for row in range(h)
    )  # filter type 0 per scanline
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode(payload: bytes):
    """Baseline RGB8 PNG decoder: chunk walk, DEFLATE, and the five
    scanline filters (spec §9: None, Sub, Up, Average, Paeth)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, idat, w, h = 8, [], None, None
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("decoder supports baseline RGB8 only")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or h is None:
        raise ValueError("not a PNG: missing IHDR chunk")
    raw = zlib.decompress(b"".join(idat))
    bpp, stride = 3, 3 * w
    out = np.zeros((h, stride), dtype=np.int64)
    for row in range(h):
        line = raw[row * (stride + 1) : (row + 1) * (stride + 1)]
        ftype, data = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        prev = out[row - 1] if row else np.zeros(stride, dtype=np.int64)
        cur = np.zeros(stride, dtype=np.int64)
        if ftype == 0:  # None
            cur[:] = data
        elif ftype == 2:  # Up
            cur[:] = (data + prev) % 256
        else:  # Sub / Average / Paeth need the left neighbor: scan
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    base = a
                elif ftype == 3:
                    base = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    base = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad filter {ftype}")
                cur[i] = (data[i] + base) % 256
        out[row] = cur
    return out.reshape(h, w, 3).astype(np.uint8)


def attach_png_images(documents: DataFrame, partitions: int | None = None) -> DataFrame:
    """Image twin of :func:`attach_wav_audio` with REAL payloads:
    each doc carries a genuine PNG container."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            payloads = pdf["doc_id"].map(lambda d: _synth_png_bytes(int(d)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": "png",
                    "payload": payloads,
                    "payload_len": payloads.map(len).astype("int64"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_format", StringType()),
            StructField("payload", BinaryType()),
            StructField("payload_len", LongType()),
        ]
    )
    src = documents.select("doc_id")
    src = src.repartition(partitions) if partitions else src
    return src.mapInPandas(gen, schema=schema)


def decode_png_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched REAL image decode: parse + defilter each PNG,
    emit dimensions and exact integer channel means (sum div count)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = _png_decode(bytes(payload)).astype("int64")
                h, w, c = px.shape
                sums = px.reshape(-1, c).sum(axis=0)
                n = h * w
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        c,
                        int(sums[0] // n),
                        int(sums[1] // n),
                        int(sums[2] // n),
                        int(px.sum() % 1_000_000_007),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA]
            )

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def _encode_png_rgb8(px) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline RGB8 PNG (filter 0
    scanlines) — the synth writer, exposed for re-encode paths."""
    import struct
    import zlib

    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[row].tobytes() for row in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_png_images(
    media: DataFrame, factor: int = 2, partitions: int | None = None
) -> DataFrame:
    """REAL resize kernel: decode each PNG, nearest-neighbor
    downsample by ``factor`` (every factor-th pixel — deterministic,
    no resampling arithmetic to drift), re-encode. The real-codec
    upgrade of the stub :func:`resize_media` for the image modality;
    same plan shape (Arrow-batched kernel, binary out of shuffles)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = _png_decode(bytes(payload))[::factor, ::factor]
                out = _encode_png_rgb8(px)
                rows.append(
                    (int(doc_id), px.shape[1], px.shape[0], out, len(out))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "resized", "resized_len"],
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("resized", BinaryType()),
            StructField("resized_len", LongType()),
        ]
    )
    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=schema)
