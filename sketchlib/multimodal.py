"""Multimodal column plumbing: images / audio / video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The actual codecs (PIL/libav/etc.) are NOT available in this environment, so
the decode step is stubbed behind ``CODEC`` — a deterministic fake codec that
parses a tiny self-describing header we also provide an encoder for. The
Spark-side plumbing is real and tested: schemas, ``mapInPandas`` batch
shapes, binary-column handling, partition-preserving feature extraction.
Swap ``CODEC`` for a real decoder on a cluster that has one; nothing else
changes.

Fake-blob format (deterministic): ``b'FAKE' + u8 kind + u16 h + u16 w + u8 c
+ payload`` where payload is h*w*c bytes (images) or u32 n_samples + bytes
(audio).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_MAGIC = b"FAKE"
KIND_IMAGE = 1
KIND_AUDIO = 2


class FakeCodec:
    """Deterministic stand-in codec. A real deployment replaces this class
    (same three methods) with PIL / soundfile / av wrappers."""

    def encode_image(self, h: int, w: int, c: int, seed: int) -> bytes:
        rng = np.random.default_rng(seed)
        payload = rng.integers(0, 256, h * w * c, dtype=np.uint8).tobytes()
        return _MAGIC + struct.pack("<BHHB", KIND_IMAGE, h, w, c) + payload

    def decode_image(self, blob: bytes) -> np.ndarray:
        if blob[:4] != _MAGIC:
            raise NotImplementedError(
                "real image codecs (PIL/turbojpeg) are not available in this "
                "environment; only FAKE blobs decode here"
            )
        kind, h, w, c = struct.unpack_from("<BHHB", blob, 4)
        if kind != KIND_IMAGE:
            raise ValueError("not an image blob")
        arr = np.frombuffer(blob, dtype=np.uint8, offset=10, count=h * w * c)
        return arr.reshape(h, w, c)

    def resize_image(self, img: np.ndarray, oh: int, ow: int) -> np.ndarray:
        # nearest-neighbor (deterministic, dependency-free)
        h, w, _ = img.shape
        ri = (np.arange(oh) * h // oh).clip(0, h - 1)
        ci = (np.arange(ow) * w // ow).clip(0, w - 1)
        return img[ri][:, ci]


CODEC = FakeCodec()

META_SCHEMA = "media_id bigint, kind int, height int, width int, channels int, n_bytes bigint"
FEAT_SCHEMA = "media_id bigint, mean_px double, std_px double, thumb array<int>"


def extract_metadata(df: DataFrame, blob_col: str = "blob", id_col: str = "media_id") -> DataFrame:
    """Header-only parse — never materializes pixel data."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                kind, h, w, c = struct.unpack_from("<BHHB", blob, 4)
                metas.append((mid, kind, h, w, c, len(blob)))
            yield pd.DataFrame(
                metas, columns=["media_id", "kind", "height", "width", "channels", "n_bytes"]
            )

    return df.select(id_col, blob_col).mapInPandas(fn, META_SCHEMA)


def image_features(df: DataFrame, blob_col: str = "blob", id_col: str = "media_id",
                   thumb: int = 4) -> DataFrame:
    """Decode → stats + thumbnail, batched per Arrow chunk (real plumbing;
    fake decode)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = CODEC.decode_image(bytes(blob))
                small = CODEC.resize_image(img, thumb, thumb)
                out.append((
                    mid, float(img.mean()), float(img.std()),
                    small.mean(axis=2).astype(np.int64).ravel().tolist(),
                ))
            yield pd.DataFrame(out, columns=["media_id", "mean_px", "std_px", "thumb"])

    return df.select(id_col, blob_col).mapInPandas(fn, FEAT_SCHEMA)


def synth_media_df(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for tests: (media_id, blob)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            blobs = [
                CODEC.encode_image(16 + int(i) % 16, 16 + int(i) % 8, 3, seed=int(i))
                for i in ids
            ]
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, "media_id bigint, blob binary"
    )
