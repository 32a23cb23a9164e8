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


def sniff_audio_video_header(payload: bytes | None):
    """REAL (non-stub) audio/video container parse — pure byte
    inspection, the same validation tier :func:`sniff_image_header`
    provides for images. Detects WAV / FLAC / OGG / MP3 audio and
    MP4-family (ISO BMFF) / Matroska-WebM / AVI video containers and
    reads what the container header itself carries: sample rate,
    channel count and duration for the audio formats that declare them,
    timescale-resolved duration for MP4 ``mvhd``. No codec library —
    truncated or mislabeled blobs are caught at header-read cost.

    Returns a dict ``{format, kind, sample_rate, channels,
    duration_ms}`` (missing fields None) or ``None`` when the payload
    matches no known container."""
    if not payload or len(payload) < 12:
        return None
    b = bytes(payload)

    def out(fmt, kind, sr=None, ch=None, dur=None):
        return {"format": fmt, "kind": kind, "sample_rate": sr,
                "channels": ch, "duration_ms": dur}

    if b[:4] == b"RIFF" and len(b) >= 12:
        if b[8:12] == b"WAVE":
            # chunk walk: fmt_ carries rate/channels/bits, data carries
            # payload size -> duration = bytes / (rate*ch*bits/8)
            i, sr, ch, bits, data_size = 12, None, None, None, None
            while i + 8 <= len(b):
                cid = b[i:i + 4]
                clen = int.from_bytes(b[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    ch = int.from_bytes(b[i + 10:i + 12], "little")
                    sr = int.from_bytes(b[i + 12:i + 16], "little")
                    if i + 24 + 2 <= len(b):
                        bits = int.from_bytes(b[i + 22:i + 24], "little")
                if cid == b"data":
                    data_size = clen
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            if sr is None or not sr or not ch:
                return None
            dur = None
            if data_size is not None and bits:
                dur = int(data_size * 8000 / (sr * ch * bits))
            return out("wav", "audio", sr, ch, dur)
        if b[8:12] in (b"AVI ", b"AVIX"):
            return out("avi", "video")
        return None
    if b[:4] == b"fLaC" and len(b) >= 26:
        # STREAMINFO is the mandatory first metadata block: bytes
        # 18..26 of the stream pack rate(20) ch(3) bits(5) samples(36)
        sr = (b[18] << 12) | (b[19] << 4) | (b[20] >> 4)
        ch = ((b[20] >> 1) & 0x07) + 1
        total = ((b[21] & 0x0F) << 32) | int.from_bytes(b[22:26], "big")
        if not sr:
            return None
        dur = int(total * 1000 / sr) if total else None
        return out("flac", "audio", sr, ch, dur)
    if b[:4] == b"OggS":
        return out("ogg", "audio")
    if b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        # MP3: ID3v2 tag or a bare MPEG frame sync; rate only when a
        # frame header is at the start (tagged streams put it later)
        sr = None
        if b[0] == 0xFF and len(b) >= 4:
            version = (b[1] >> 3) & 0x03   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            rates = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
                     0: (11025, 12000, 8000)}.get(version)
            idx = (b[2] >> 2) & 0x03
            if rates and idx < 3:
                sr = rates[idx]
        return out("mp3", "audio", sr)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # ISO BMFF box walk: duration comes from moov/mvhd when the
        # prefix carries it (timescale + duration, version 0 or 1)
        def find_box(buf, start, end, name):
            i = start
            while i + 8 <= end:
                size = int.from_bytes(buf[i:i + 4], "big")
                if size == 1:  # 64-bit largesize
                    if i + 16 > end:
                        return None
                    size = int.from_bytes(buf[i + 8:i + 16], "big")
                    hdr = 16
                else:
                    hdr = 8
                if size < hdr:
                    return None
                if buf[i + 4:i + 8] == name:
                    return (i + hdr, min(i + size, end))
                i += size
            return None

        dur = None
        moov = find_box(b, 0, len(b), b"moov")
        if moov:
            mvhd = find_box(b, moov[0], moov[1], b"mvhd")
            if mvhd:
                s, _e = mvhd
                ver = b[s]
                if ver == 1 and s + 32 <= len(b):
                    ts = int.from_bytes(b[s + 20:s + 24], "big")
                    d = int.from_bytes(b[s + 24:s + 32], "big")
                elif ver == 0 and s + 24 <= len(b):
                    ts = int.from_bytes(b[s + 12:s + 16], "big")
                    d = int.from_bytes(b[s + 16:s + 20], "big")
                else:
                    ts = d = 0
                if ts:
                    dur = int(d * 1000 / ts)
        brand = b[8:12].decode("ascii", "replace").strip()
        return out(f"mp4/{brand}", "video", dur=dur)
    if b[:4] == b"\x1aE\xdf\xa3":
        return out("webm/matroska", "video")
    return None


def sniff_media_header(payload: bytes | None):
    """One-call media sniff: images first (:func:`sniff_image_header`),
    then audio/video containers. Returns a uniform dict
    ``{format, kind, width, height, sample_rate, channels,
    duration_ms}`` or ``None``."""
    img = sniff_image_header(payload)
    if img is not None:
        return {"format": img[0], "kind": "image", "width": img[1],
                "height": img[2], "sample_rate": None, "channels": None,
                "duration_ms": None}
    av = sniff_audio_video_header(payload)
    if av is None:
        return None
    return {"format": av["format"], "kind": av["kind"], "width": None,
            "height": None, "sample_rate": av["sample_rate"],
            "channels": av["channels"], "duration_ms": av["duration_ms"]}


HEADER_SCHEMA = ("media_id long, detected_format string, "
                 "header_width int, header_height int, ok boolean")

MEDIA_HEADER_SCHEMA = (
    "media_id long, detected_format string, kind string, "
    "header_width int, header_height int, sample_rate int, "
    "channels int, duration_ms long, ok boolean")


def probe_media_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched MULTI-modal header validation (r12): images,
    audio, and video containers through one ``mapInPandas`` pass over
    the binary column — same dead-letter discipline as
    :func:`probe_image_headers` (unknown container -> ok=false, NULL
    fields), same bounded-batch memory story."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        cols = ("detected_format", "kind", "header_width",
                "header_height", "sample_rate", "channels",
                "duration_ms")
        for pdf in batches:
            acc = {c: [] for c in cols}
            oks = []
            for payload in pdf["payload"]:
                info = sniff_media_header(payload)
                oks.append(info is not None)
                info = info or {}
                acc["detected_format"].append(info.get("format"))
                acc["kind"].append(info.get("kind"))
                acc["header_width"].append(info.get("width"))
                acc["header_height"].append(info.get("height"))
                acc["sample_rate"].append(info.get("sample_rate"))
                acc["channels"].append(info.get("channels"))
                acc["duration_ms"].append(info.get("duration_ms"))
            yield _pd.DataFrame({
                "media_id": pdf["media_id"],
                "detected_format": acc["detected_format"],
                "kind": acc["kind"],
                "header_width": _pd.array(acc["header_width"],
                                          dtype="Int32"),
                "header_height": _pd.array(acc["header_height"],
                                           dtype="Int32"),
                "sample_rate": _pd.array(acc["sample_rate"],
                                         dtype="Int32"),
                "channels": _pd.array(acc["channels"], dtype="Int32"),
                "duration_ms": _pd.array(acc["duration_ms"],
                                         dtype="Int64"),
                "ok": oks,
            })

    return media.select("media_id", "payload").mapInPandas(
        op, schema=MEDIA_HEADER_SCHEMA)


def make_wav_bytes(sample_rate: int = 16_000, channels: int = 1,
                   bits: int = 16, n_samples: int = 1600) -> bytes:
    """A VALID minimal RIFF/WAVE byte string (silence) — the test
    stand-in for a real audio ingest, so the sniffing tier is
    exercised on genuine container bytes, not mocks."""
    data = b"\x00" * (n_samples * channels * bits // 8)
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")          # PCM
           + channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * channels * bits // 8).to_bytes(4, "little")
           + (channels * bits // 8).to_bytes(2, "little")
           + bits.to_bytes(2, "little"))
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks)


def make_mp4_bytes(duration_ms: int = 5_000,
                   timescale: int = 1_000) -> bytes:
    """A VALID minimal ISO-BMFF byte string: ftyp + moov/mvhd carrying
    (timescale, duration) — enough for the sniffing tier's box walk."""
    ftyp = b"ftypisom" + (0x200).to_bytes(4, "big") + b"isomiso2"
    ftyp = (len(ftyp) + 4).to_bytes(4, "big") + ftyp
    dur = duration_ms * timescale // 1000
    mvhd_body = (b"\x00\x00\x00\x00"           # version 0 + flags
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
                 + b"\x00" * 80)
    mvhd = (len(mvhd_body) + 8).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (len(mvhd) + 8).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + moov


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
