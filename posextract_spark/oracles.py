"""Closed-form DuckDB oracles for operators whose inputs are deterministic
generators rather than the driver's parquet views.

The media corpus (sources/media.py) derives every payload from
``np.random.default_rng([seed, media_id])``, so the expected feature rows
are computable driver-side by replaying the *generator RNG only* — the
arrays are re-drawn here and features computed straight from them with
numpy, deliberately bypassing the SIMG/SAUD/SVID codecs in
operators/multimodal.py. The distributed path must therefore get
encode -> Arrow -> decode -> feature math exactly right to hash-match.

The expected rows are rendered as a DuckDB ``VALUES`` table with explicit
casts so schema comparison is exact (BIGINT/INT parity with the Spark
schemas).
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Sequence, Tuple

import numpy as np

_KINDS = ("image", "audio", "video")


def _values_sql(
    rows: Sequence[Tuple], columns: Sequence[Tuple[str, str]]
) -> str:
    """SELECT over a VALUES table with per-column casts.

    columns: [(name, duckdb_type), ...]; row cells are ints or strings.
    """

    def cell(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    body = ", ".join("(" + ", ".join(cell(v) for v in row) + ")" for row in rows)
    names = ", ".join(name for name, _ in columns)
    casts = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in columns)
    return f"SELECT {casts} FROM (VALUES {body}) AS t({names})"


def _replay_image(rng: np.random.Generator) -> np.ndarray:
    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _replay_audio(rng: np.random.Generator):
    rate = int(rng.choice([8000, 16000]))
    n = int(rng.integers(100, 1000))
    return rate, rng.integers(-32768, 32767, size=n, dtype=np.int16)


def _replay_video_nframes(rng: np.random.Generator) -> int:
    rng.integers(8, 32), rng.integers(8, 32)  # w, h draws precede n_frames
    return int(rng.integers(4, 16))


def media_image_features_sql(n: int = 120, seed: int = 42, n_bins: int = 4) -> str:
    rows: List[Tuple] = []
    for i in range(0, n, 1):
        if _KINDS[i % 3] != "image":
            continue
        px = _replay_image(np.random.default_rng([seed, i]))
        hist = np.histogram(px, bins=n_bins, range=(0, 256))[0]
        rows.append(
            (
                i,
                px.shape[1],
                px.shape[0],
                int(np.floor(px.mean() * 10000)),
                int(np.floor(px.std() * 10000)),
                *[int(x) for x in hist],
            )
        )
    cols = [
        ("media_id", "BIGINT"),
        ("width", "INT"),
        ("height", "INT"),
        ("mean_e4", "BIGINT"),
        ("std_e4", "BIGINT"),
    ] + [(f"hist_{b}", "BIGINT") for b in range(n_bins)]
    return _values_sql(rows, cols)


def media_audio_features_sql(n: int = 120, seed: int = 42) -> str:
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "audio":
            continue
        rate, samples = _replay_audio(np.random.default_rng([seed, i]))
        x = samples.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zc = int(np.sum(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0
        rows.append((i, rate, len(samples), int(np.floor(rms * 10000)), zc))
    cols = [
        ("media_id", "BIGINT"),
        ("sample_rate", "INT"),
        ("n_samples", "BIGINT"),
        ("rms_e4", "BIGINT"),
        ("zero_crossings", "BIGINT"),
    ]
    return _values_sql(rows, cols)


def media_resize_sql(n: int = 120, seed: int = 42, factor: int = 2) -> str:
    """Expected (media_id, width, height, payload_md5) after an integer-factor
    box downscale. The SIMG framing (magic + <HH dims + raw bytes) is
    replicated inline so the md5 pins the full payload bytes, not just dims."""
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "image":
            continue
        px = _replay_image(np.random.default_rng([seed, i]))
        h, w = px.shape
        h2, w2 = (h // factor) * factor, (w // factor) * factor
        small = (
            px[:h2, :w2]
            .reshape(h2 // factor, factor, w2 // factor, factor)
            .mean(axis=(1, 3))
        )
        small = np.floor(small).astype(np.uint8)
        payload = (
            b"SIMG"
            + struct.pack("<HH", small.shape[1], small.shape[0])
            + small.tobytes()
        )
        rows.append(
            (i, small.shape[1], small.shape[0], hashlib.md5(payload).hexdigest())
        )
    cols = [
        ("media_id", "BIGINT"),
        ("width", "INT"),
        ("height", "INT"),
        ("payload_md5", "VARCHAR"),
    ]
    return _values_sql(rows, cols)


def media_frame_sample_sql(n: int = 120, seed: int = 42, every_k: int = 2) -> str:
    """Expected sampled-frame count per video: ceil(n_frames / every_k)."""
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "video":
            continue
        n_frames = _replay_video_nframes(np.random.default_rng([seed, i]))
        rows.append((i, (n_frames + every_k - 1) // every_k))
    cols = [("media_id", "BIGINT"), ("n_frames_sampled", "BIGINT")]
    return _values_sql(rows, cols)
