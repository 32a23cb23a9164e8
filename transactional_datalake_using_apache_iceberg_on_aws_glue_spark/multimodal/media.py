"""Binary media columns: schema + mapInPandas operators.

Design for 100 TB of media:
- payloads are ``binary`` columns (or object-store URIs for > ~100 MB
  blobs) with a typed metadata struct alongside — never parsed strings;
- every operator is ``mapInPandas`` (Arrow batches) so payload bytes
  move executor->Python once per BATCH, not per row;
- decode/resize/frame-sample are per-partition streaming: memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
  not partition size;
- the codec calls themselves are STUBBED (``_decode_stub``) — marked
  loudly; swapping in Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),  # >1 => video
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", IMAGE_META_SCHEMA),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic fake media column from an id column —
    the test stand-in for a real binary ingest (no media fixtures in
    the harness). Payload bytes = md5 of the id, metadata derived."""
    ic = F.col(id_col)
    return df.select(
        ic.cast("long").alias("media_id"),
        F.unhex(F.md5(ic.cast("string"))).alias("payload"),
        F.struct(
            (F.pmod(ic, F.lit(640)) + 32).cast("int").alias("width"),
            (F.pmod(ic, F.lit(480)) + 32).cast("int").alias("height"),
            F.when(ic % 2 == 0, "png").otherwise("jpeg").alias("format"),
            F.when(ic % 10 == 0, 30).otherwise(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, fmt: str) -> list[float]:
    """STUB decoder: no image libs in this environment. Returns a
    deterministic 8-dim 'pixel statistic' vector derived from payload
    bytes, preserving the real operator's shape (bytes -> float features).
    Replace with Pillow/torchvision decode in production."""
    if payload is None:
        raise NotImplementedError("real codec path not available here")
    b = payload[:8].ljust(8, b"\0")
    return [x / 255.0 for x in b]


DECODED_SCHEMA = "media_id long, width int, height int, ok boolean, pixels array<float>"


def decode_images(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched decode: mapInPandas so each Python call handles a
    columnar batch of payloads. Bad payloads yield ok=false rows (dead
    letter discipline) instead of failing the task.

    ``op`` captures the codec as a local variable so cloudpickle ships
    it by VALUE — a module-level reference would require this package
    to be importable on every executor's Python worker."""
    decode = _decode_stub

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": pdf["meta"].map(lambda m: m["width"]),
                "height": pdf["meta"].map(lambda m: m["height"]),
            }
            pixels, ok = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    pixels.append(decode(payload, meta["format"]))
                    ok.append(True)
                except Exception:  # noqa: BLE001 — dead-letter, don't fail the task
                    pixels.append(None)
                    ok.append(False)
            out["ok"] = ok
            out["pixels"] = pixels
            yield _pd.DataFrame(out)

    return media.mapInPandas(op, schema=DECODED_SCHEMA)


def sniff_image_header(payload: bytes | None):
    """REAL (non-stub) header parse — pure byte inspection, no codec
    libraries: detects PNG / JPEG / GIF / BMP payloads and reads their
    dimensions from the container header. This is the validation tier
    a 100 TB ingest runs BEFORE any decode: it catches truncated and
    mislabeled payloads at ~header-read cost (a few dozen bytes per
    blob) instead of paying a full decode to discover garbage.

    Returns ``(format, width, height)`` or ``None`` when the payload
    matches no known container."""
    if not payload or len(payload) < 16:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 24 or b[12:16] != b"IHDR":
            return None
        return ("png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    if b[:2] == b"BM" and len(b) >= 26:
        return ("bmp", int.from_bytes(b[18:22], "little"),
                abs(int.from_bytes(b[22:26], "little", signed=True)))
    if b[:2] == b"\xff\xd8":  # JPEG: scan for a start-of-frame marker
        i = 2
        while i + 3 < len(b):
            if b[i] != 0xFF:
                return None  # marker desync: corrupt stream
            # consecutive 0xFF bytes before a marker are legal fill /
            # padding (ITU T.81 B.1.1.2) — skip to the real marker byte
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 3 >= len(b):
                return None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI: stream ended with no SOF
                return None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(b[i + 2:i + 4], "big")
            if seg_len < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    return None
                return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"))
            i += 2 + seg_len
        return None
    return None


HEADER_SCHEMA = ("media_id long, detected_format string, "
                 "header_width int, header_height int, ok boolean")


def probe_image_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched header validation over binary payloads: one
    Python call per columnar batch, a few dozen bytes inspected per
    blob (``sniff_image_header``). Rows whose payload matches no known
    container come back ``ok=false`` (dead-letter discipline) with
    NULL dimensions — ready to route to quarantine before the
    expensive decode tier."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            fmts, ws, hs, oks = [], [], [], []
            for payload in pdf["payload"]:
                info = sniff_image_header(payload)
                if info is None:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    oks.append(False)
                else:
                    fmts.append(info[0])
                    ws.append(info[1])
                    hs.append(info[2])
                    oks.append(True)
            yield _pd.DataFrame({
                "media_id": pdf["media_id"],
                "detected_format": fmts,
                "header_width": _pd.array(ws, dtype="Int32"),
                "header_height": _pd.array(hs, dtype="Int32"),
                "ok": oks,
            })

    return media.select("media_id", "payload").mapInPandas(
        op, schema=HEADER_SCHEMA)


def extract_image_features(decoded: DataFrame) -> DataFrame:
    """Feature extraction over decoded pixel stats — JVM-side array math
    once decode produced numeric columns (Python only for the codec)."""
    px = F.col("pixels")
    mean = F.aggregate(px, F.lit(0.0), lambda a, v: a + v.cast("double")) / F.size(px)
    return decoded.filter(F.col("ok")).select(
        "media_id",
        "width",
        "height",
        F.round(mean, 6).alias("pixel_mean"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
    )


def sample_video_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling plumbing: explode frame indices for multi-frame
    payloads (n_frames > 1); the per-frame decode is the same stubbed
    codec boundary. Partitioning: frames of one video stay in one task
    (explode is narrow), so a later groupBy(media_id) needs no extra
    shuffle beyond the aggregation's own."""
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
    return (
        media.filter(F.col("meta.n_frames") > 1)
        .select("media_id", "payload", F.explode(frames).alias("frame_index"))
    )
