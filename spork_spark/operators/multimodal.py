"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata structs, processed by Arrow-batched pandas iterators.

The Spark-side plumbing — schemas, mapInPandas signatures, batch shapes,
partition sizing — is real and tested. The actual codecs (PIL/ffmpeg/…)
are NOT in this container, so the decode kernels are deterministic fakes
behind `_HAS_CODECS`; swapping in real ones changes no plan shape. This is
the honest split: at 100 TB what matters is that binary payloads never
pass through Python row-at-a-time, batches stay Arrow-sized, and metadata
lives in queryable typed columns next to the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAS_CODECS = False           # PIL / soundfile / av not present in this env

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_binary_meta(df: DataFrame, bin_col: str,
                       meta_col: str = "meta") -> DataFrame:
    """Cheap metadata extractable without a codec: byte length + magic-byte
    format sniffing, as a typed struct column (JVM-side only)."""
    b = F.col(bin_col)
    head = F.hex(F.substring(b, 1, 4))
    fmt = (F.when(head.startswith("89504E47"), "png")
            .when(head.startswith("FFD8FF"), "jpeg")
            .when(head.startswith("47494638"), "gif")
            .when(head.startswith("52494646"), "riff")
            .otherwise("unknown"))
    meta = F.struct(F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    fmt.alias("format"),
                    F.octet_length(b).cast("long").alias("n_bytes"))
    return df.withColumn(meta_col, meta)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives a stable
    (width, height) from a crc32 of the payload (NOT Python ``hash()``,
    which is salted per-process and would differ across executors).
    Replaced by PIL.Image.open when codecs exist."""
    import zlib
    h = zlib.crc32(payload) & 0x7FFFFFFF
    return 16 + h % 1024, 16 + (h >> 10) % 1024


def decode_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "item_id") -> DataFrame:
    """Decode → (id, width, height, format, n_bytes). Arrow-batched
    mapInPandas: the binary column crosses to Python once per batch, not
    per row; output drops the blob so downstream stages don't carry it."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            if _HAS_CODECS:                     # pragma: no cover
                raise NotImplementedError("real codec path")
            dims = [_fake_decode(bytes(p)) for p in pdf[bin_col]]
            yield pd.DataFrame({
                "item_id": pdf[id_col].astype("int64"),
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
                "n_bytes": pdf[bin_col].map(len).astype("int64"),
            })

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def extract_features(df: DataFrame, bin_col: str = "payload",
                     id_col: str = "item_id", dim: int = 64) -> DataFrame:
    """Binary → feature vector (array<float>), Arrow-batched. The fake
    kernel hashes byte windows into a stable pseudo-embedding; a real
    model swap changes only the kernel body."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            feats = []
            for p in pdf[bin_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                if arr.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                pad = np.resize(arr, ((arr.size + dim - 1) // dim) * dim)
                vec = pad.reshape(-1, dim).astype(np.float32).mean(axis=0)
                feats.append((vec / 255.0).astype(np.float32))
            yield pd.DataFrame({"item_id": pdf[id_col].astype("int64"),
                                "embedding": [f.tolist() for f in feats]})

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "item_id", every_n: int = 10) -> DataFrame:
    """Video → sampled frame rows (1→N fan-out through mapInPandas).
    Fake kernel emits ceil(n_bytes/4096/every_n) synthetic frame indexes —
    the fan-out shape (one input row, many output rows, preserved id) is
    what the plan/tests pin down."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ])

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                payload = bytes(p)
                n_frames = max(len(payload) // 4096, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i)); idxs.append(fi)
                    blobs.append(payload[fi * 4096:(fi + 1) * 4096])
            yield pd.DataFrame({"item_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_bytes": blobs})

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)
