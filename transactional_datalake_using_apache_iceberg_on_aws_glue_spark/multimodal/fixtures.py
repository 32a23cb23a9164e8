"""Deterministic binary-media fixture table (judge r13 brief #4).

The multimodal tier was the one M4 capability with no oracle row: the
header sniffers (:mod:`.media`) were pytest-only because the harness
ships no media fixture table. This module closes that gap by
GENERATING one — genuine minimal container bytes (PNG/JPEG/GIF/BMP
images, WAV/FLAC/MP3/OGG audio, MP4/Matroska/AVI video, plus
deliberately-corrupt payloads) with the generator's ground-truth
parameters written alongside as columns. The registry query
``media_header_stats`` then byte-parses the payloads on the Spark side
while the DuckDB oracle reads the truth columns from the SAME parquet
file: a hash match proves parse == truth per row, end to end through
the ``mapInPandas`` plumbing.

Everything is deterministic (fixed parameter tables keyed by row
index, no RNG, no timestamps), so every process — driver gate, bench,
pytest — converges on identical VALUES regardless of who built the
file. The cache lives under the local tempdir by design (it is a
generated test fixture, not engine data; engine metadata planes go
through :mod:`..fsutil`), and the build is write-temp + ``os.replace``
so concurrent builders are safe.
"""

from __future__ import annotations

import os
import tempfile

from .media import make_mp4_bytes, make_wav_bytes

#: bump when the generator changes so stale caches self-invalidate
MEDIA_FIXTURE_VERSION = 1

#: rows per container family
N_PER_KIND = 6


def media_fixture_path() -> str:
    return os.path.join(tempfile.gettempdir(), "spark_graft_media",
                        f"v{MEDIA_FIXTURE_VERSION}", "media.parquet")


# -- container builders (genuine bytes, minimal valid prefixes) ---------

def make_png_bytes(width: int, height: int) -> bytes:
    """Signature + IHDR chunk (depth 8, truecolor) — the prefix the
    sniffing tier reads; the CRC is not validated at header-read cost."""
    return (b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR"
            + width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00")


def make_jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + a single SOF0 segment (precision 8, 3 components)."""
    return (b"\xff\xd8\xff\xc0" + (17).to_bytes(2, "big")
            + b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big")
            + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
            + b"\xff\xd9")


def make_gif_bytes(width: int, height: int) -> bytes:
    return (b"GIF89a" + width.to_bytes(2, "little")
            + height.to_bytes(2, "little") + b"\x00" * 8)


def make_bmp_bytes(width: int, height: int) -> bytes:
    return (b"BM" + (26 + 14).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + width.to_bytes(4, "little")
            + height.to_bytes(4, "little", signed=True) + b"\x00" * 14)


def make_flac_bytes(sample_rate: int, channels: int,
                    total_samples: int) -> bytes:
    """fLaC marker + last-metadata STREAMINFO block carrying
    (rate:20, channels-1:3, bits-1:5, total:36) in its packed field."""
    b18 = (sample_rate >> 12) & 0xFF
    b19 = (sample_rate >> 4) & 0xFF
    b20 = ((sample_rate & 0x0F) << 4) | (((channels - 1) & 0x07) << 1)
    b21 = (total_samples >> 32) & 0x0F
    return (b"fLaC" + bytes([0x80, 0, 0, 34])
            + b"\x10\x00\x10\x00" + b"\x00" * 6       # block/frame sizes
            + bytes([b18, b19, b20, b21])
            + (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
            + b"\x00" * 16)                            # md5 placeholder


def make_mp3_bytes() -> bytes:
    """Bare MPEG1 Layer-III frame sync, 44100 Hz rate index."""
    return b"\xff\xfb\x90\x00" + b"\x00" * 16


def make_ogg_bytes() -> bytes:
    return b"OggS" + b"\x00" * 24


def make_mkv_bytes() -> bytes:
    return b"\x1aE\xdf\xa3" + b"\x00" * 16


def make_avi_bytes() -> bytes:
    return b"RIFF" + (100).to_bytes(4, "little") + b"AVI " + b"\x00" * 16


def make_corrupt_bytes(i: int) -> bytes:
    """Matches no known container: leading NUL kills every magic-number
    branch and the MP3 frame-sync test (which needs b[0] == 0xFF)."""
    return (b"\x00corrupt-" + str(i).encode()).ljust(20, b"\x00")


# -- ground-truth row table ---------------------------------------------

def media_rows() -> list[dict]:
    """(media_id, payload, true_*) rows — truth values computed with
    the SAME arithmetic the sniffers use (e.g. WAV duration truncates
    through float division exactly like ``sniff_audio_video_header``)."""
    rows: list[dict] = []

    def add(payload, fmt, kind, w=None, h=None, sr=None, ch=None,
            dur=None):
        rows.append({
            "media_id": len(rows),
            "payload": payload,
            "true_format": fmt, "true_kind": kind,
            "true_width": w, "true_height": h,
            "true_sample_rate": sr, "true_channels": ch,
            "true_duration_ms": dur,
        })

    for i in range(N_PER_KIND):
        add(make_png_bytes(100 + 7 * i, 50 + 3 * i), "png", "image",
            w=100 + 7 * i, h=50 + 3 * i)
        add(make_jpeg_bytes(320 + 5 * i, 200 + 11 * i), "jpeg", "image",
            w=320 + 5 * i, h=200 + 11 * i)
        add(make_gif_bytes(16 + i, 8 + i), "gif", "image",
            w=16 + i, h=8 + i)
        add(make_bmp_bytes(64 + 2 * i, 48 + i), "bmp", "image",
            w=64 + 2 * i, h=48 + i)

        sr = (8000, 11025, 16000, 22050, 44100, 48000)[i]
        ch = 1 + (i % 2)
        n_samples = 1000 + 160 * i
        data_size = n_samples * ch * 2  # 16-bit PCM
        add(make_wav_bytes(sr, ch, 16, n_samples), "wav", "audio",
            sr=sr, ch=ch, dur=int(data_size * 8000 / (sr * ch * 16)))

        fsr = 22050 + 150 * i
        fch = 1 + (i % 3)
        total = 44100 * (i + 1) + 17 * i
        add(make_flac_bytes(fsr, fch, total), "flac", "audio",
            sr=fsr, ch=fch, dur=int(total * 1000 / fsr))

        add(make_mp3_bytes(), "mp3", "audio", sr=44100)
        add(make_ogg_bytes(), "ogg", "audio")

        dur_ms = 1000 * (i + 1) + 37 * i
        add(make_mp4_bytes(duration_ms=dur_ms, timescale=1000),
            "mp4/isom", "video", dur=dur_ms)
        add(make_mkv_bytes(), "webm/matroska", "video")
        add(make_avi_bytes(), "avi", "video")

        add(make_corrupt_bytes(i), None, None)
    return rows


def ensure_media_fixture() -> str:
    """Build-if-absent the fixture parquet; returns its path. Pure
    pyarrow (no Spark session needed — ``oracle_sql()`` callers may
    have none); atomic publish via ``os.replace`` so racing builders
    are safe and readers never see a torn file."""
    path = media_fixture_path()
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = media_rows()
    table = pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        "true_format": pa.array([r["true_format"] for r in rows],
                                pa.string()),
        "true_kind": pa.array([r["true_kind"] for r in rows], pa.string()),
        "true_width": pa.array([r["true_width"] for r in rows],
                               pa.int32()),
        "true_height": pa.array([r["true_height"] for r in rows],
                                pa.int32()),
        "true_sample_rate": pa.array([r["true_sample_rate"] for r in rows],
                                     pa.int32()),
        "true_channels": pa.array([r["true_channels"] for r in rows],
                                  pa.int32()),
        "true_duration_ms": pa.array([r["true_duration_ms"] for r in rows],
                                     pa.int64()),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
