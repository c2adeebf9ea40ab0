"""Deterministic synthetic media table (multimodal operators' input).

Distributed generation (mapInPandas over spark.range) of SIMG/SAUD/SVID
payloads with matching typed metadata — the payload bytes derive from
numpy PRNGs seeded per (seed, media_id), so any scale regenerates
identically and feature outputs are exactly reproducible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from posextract_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_saud,
    encode_simg,
    encode_svid,
)


def gen_media_row(i: int, seed: int = 42) -> tuple:
    rng = np.random.default_rng([seed, i])
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        return (i, kind, encode_simg(px), (w, h, "SIMG", None, None))
    if kind == "audio":
        rate = int(rng.choice([8000, 16000]))
        n = int(rng.integers(100, 1000))
        samples = rng.integers(-32768, 32767, size=n, dtype=np.int16)
        return (i, kind, encode_saud(rate, samples), (None, None, "SAUD", None, rate))
    w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
    n_frames = int(rng.integers(4, 16))
    frames = rng.integers(0, 256, size=(n_frames, h, w), dtype=np.uint8)
    return (i, kind, encode_svid(frames), (w, h, "SVID", n_frames, None))


def generate_media(
    spark: SparkSession, n: int, seed: int = 42, n_partitions: int = 8
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_media_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).repartition(n_partitions).mapInPandas(gen, MEDIA_SCHEMA)
