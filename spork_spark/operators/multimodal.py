"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata structs, processed by Arrow-batched pandas iterators.

Codec status (this container has no PIL/ffmpeg, but real decoding is still
possible without them):

- REAL: PNM (P5 PGM / P6 PPM) full raster decode — pure numpy.
- REAL: PNG / GIF / BMP / JPEG dimension parsing — pure header reads
  (IHDR chunk, logical screen descriptor, BITMAPINFOHEADER, SOF scan).
- REAL: WAV PCM audio decode — stdlib ``wave`` + numpy.
- FAKE (documented): payloads in none of the above formats fall back to a
  deterministic crc32-derived stand-in so pipelines keep flowing; swap in
  PIL/ffmpeg kernels without changing any plan shape.

At 100 TB what matters is that binary payloads never pass through Python
row-at-a-time, batches stay Arrow-sized, and metadata lives in queryable
typed columns next to the blob — all of which is independent of which
codec runs inside the kernel.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
            .when(head.startswith("424D"), "bmp")
            .when(head.startswith("5035") | head.startswith("5036"), "pnm")
            .otherwise("unknown"))
    meta = F.struct(F.lit(None).cast("int").alias("width"),
                    F.lit(None).cast("int").alias("height"),
                    fmt.alias("format"),
                    F.octet_length(b).cast("long").alias("n_bytes"))
    return df.withColumn(meta_col, meta)


# --------------------------------------------------------------- real codecs

_PNM_HEADER = re.compile(
    rb"^(P[56])\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)"
    rb"\s+(?:#[^\n]*\s+)*(\d+)\s")


def parse_pnm_header(payload: bytes):
    """Parse a binary PNM header → (magic, width, height, maxval,
    raster_offset) or None. P5 = grayscale, P6 = RGB."""
    m = _PNM_HEADER.match(payload)
    if not m:
        return None
    return (m.group(1).decode(), int(m.group(2)), int(m.group(3)),
            int(m.group(4)), m.end())


def decode_pnm(payload: bytes):
    """REAL raster decode of P5/P6 (the uncompressed netpbm formats) into a
    numpy array of shape (h, w) or (h, w, 3). Raises ValueError on
    truncated rasters; maxval>255 (16-bit big-endian) supported."""
    import numpy as np
    hdr = parse_pnm_header(payload)
    if hdr is None:
        raise ValueError("not a binary PNM payload")
    magic, w, h, maxval, off = hdr
    ch = 3 if magic == "P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    need = w * h * ch * dt.itemsize
    raster = payload[off:off + need]
    if len(raster) < need:
        raise ValueError(f"truncated PNM raster: {len(raster)} < {need}")
    arr = np.frombuffer(raster, dtype=dt).reshape(
        (h, w) if ch == 1 else (h, w, 3))
    return arr


def parse_image_dims(payload: bytes):
    """REAL dimension extraction by container header, no pixel codec needed:
    returns (width, height, format) or None if the format is unknown.

    PNG: IHDR fixed offset; GIF: logical screen descriptor; BMP:
    BITMAPINFOHEADER; JPEG: scan to the first SOFn marker; PNM: header.
    """
    import struct
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if payload[:4] in (b"GIF8", b"GIF9") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return w, abs(h), "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return w, h, "jpeg"
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
            i += 2 + seglen
        return None
    hdr = parse_pnm_header(payload)
    if hdr is not None:
        _, w, h, _, _ = hdr
        return w, h, "pnm"
    return None


def decode_wav(payload: bytes):
    """REAL WAV PCM decode via stdlib wave + numpy → dict(sample_rate,
    channels, n_frames, duration_s, rms). 8/16/32-bit PCM."""
    import io
    import wave

    import numpy as np
    with wave.open(io.BytesIO(payload)) as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dt is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    samples = np.frombuffer(raw, dtype=dt).astype(np.float64)
    if width == 1:
        samples -= 128.0          # 8-bit WAV is unsigned
    rms = float(np.sqrt(np.mean(samples ** 2))) if samples.size else 0.0
    return {"sample_rate": rate, "channels": nch, "n_frames": n,
            "duration_s": n / rate if rate else 0.0, "rms": rms}


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for payloads in a format none of the real
    parsers handle: derives a stable (width, height) from a crc32 of the
    payload (NOT Python ``hash()``, which is salted per-process and would
    differ across executors)."""
    import zlib
    h = zlib.crc32(payload) & 0x7FFFFFFF
    return 16 + h % 1024, 16 + (h >> 10) % 1024


# ------------------------------------------------------- DataFrame operators

def decode_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "item_id") -> DataFrame:
    """Decode → (id, width, height, format, n_bytes). Arrow-batched
    mapInPandas: the binary column crosses to Python once per batch, not
    per row; output drops the blob so downstream stages don't carry it.

    width/height/format are REAL for png/gif/bmp/jpeg/pnm payloads
    (header parsers above); unknown formats get the deterministic fake
    dims and format='unknown'."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            dims = []
            for p in pdf[bin_col]:
                # bad files are data: NULL payloads and parser crashes
                # must not kill a 100 TB job
                payload = bytes(p) if p is not None else b""
                try:
                    parsed = parse_image_dims(payload)
                except Exception:
                    parsed = None
                if parsed is None:
                    w, h = _fake_decode(payload)
                    dims.append((w, h, "unknown"))
                else:
                    dims.append(parsed)
            yield pd.DataFrame({
                "item_id": pdf[id_col].astype("int64"),
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
                "format": [d[2] for d in dims],
                "n_bytes": pdf[bin_col].map(
                    lambda p: len(p) if p is not None else 0).astype("int64"),
            })

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def decode_pixel_stats(df: DataFrame, bin_col: str = "payload",
                       id_col: str = "item_id") -> DataFrame:
    """REAL full-raster decode for PNM payloads → per-image pixel stats
    (n_pixels, mean_px, min_px, max_px). Non-PNM payloads yield nulls
    (decode errors must not kill a 100 TB job — bad files are data)."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("min_px", T.IntegerType()),
        T.StructField("max_px", T.IntegerType()),
    ])

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    arr = decode_pnm(bytes(p))
                    rows.append((int(i), int(arr.size),
                                 float(arr.mean()), int(arr.min()),
                                 int(arr.max())))
                except Exception:       # NULL payload, truncated, not PNM
                    rows.append((int(i), None, None, None, None))
            yield pd.DataFrame(rows, columns=["item_id", "n_pixels",
                                              "mean_px", "min_px", "max_px"])

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def decode_audio(df: DataFrame, bin_col: str = "payload",
                 id_col: str = "item_id") -> DataFrame:
    """REAL WAV PCM decode → (id, sample_rate, channels, n_frames,
    duration_s, rms). Non-WAV payloads yield nulls."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    m = decode_wav(bytes(p))
                    rows.append((int(i), m["sample_rate"], m["channels"],
                                 m["n_frames"], m["duration_s"], m["rms"]))
                except Exception:
                    rows.append((int(i), None, None, None, None, None))
            yield pd.DataFrame(rows, columns=["item_id", "sample_rate",
                                              "channels", "n_frames",
                                              "duration_s", "rms"])

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def resize_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "item_id", factor: int = 2) -> DataFrame:
    """REAL nearest-neighbor downsample for PNM payloads: numpy stride
    slicing (out[i,j] = in[i*f, j*f], so out dims are ceil(in/f)),
    re-encoded as a valid binary PNM the decoders can read back —
    the resize stage of an image-training pipeline. Arrow-batched
    mapInPandas; non-PNM/broken payloads yield null output columns
    (bad files are data). Output: (id, payload, width, height)."""
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    raw = bytes(p)
                    arr = decode_pnm(raw)
                    if arr.dtype.itemsize != 1:
                        raise ValueError("16-bit PNM resize unsupported")
                    # Preserve the SOURCE maxval: re-declaring 255 would
                    # silently rescale any maxval<255 image for
                    # standards-conformant readers that normalize by it.
                    maxval = parse_pnm_header(raw)[3]
                    small = arr[::factor, ::factor]
                    h, w = small.shape[:2]
                    magic = b"P6" if small.ndim == 3 else b"P5"
                    payload = (magic + b"\n" + str(w).encode() + b" "
                               + str(h).encode() + b"\n"
                               + str(maxval).encode() + b"\n"
                               + np.ascontiguousarray(small).tobytes())
                    rows.append((int(i), payload, w, h))
                except Exception:
                    rows.append((int(i), None, None, None))
            yield pd.DataFrame(rows, columns=["item_id", "payload",
                                              "width", "height"])

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def extract_features(df: DataFrame, bin_col: str = "payload",
                     id_col: str = "item_id", dim: int = 64) -> DataFrame:
    """Binary → feature vector (array<float>), Arrow-batched. The kernel
    hashes byte windows into a stable pseudo-embedding; a real model swap
    changes only the kernel body."""
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
                arr = np.frombuffer(bytes(p) if p is not None else b"",
                                    dtype=np.uint8)
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
    No container-free video codec exists, so the kernel emits
    ceil(n_bytes/4096/every_n) synthetic frame windows — the fan-out shape
    (one input row, many output rows, preserved id) is what the
    plan/tests pin down; an ffmpeg swap changes only the kernel body."""
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
                payload = bytes(p) if p is not None else b""
                n_frames = max(len(payload) // 4096, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i)); idxs.append(fi)
                    blobs.append(payload[fi * 4096:(fi + 1) * 4096])
            yield pd.DataFrame({"item_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_bytes": blobs})

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def ahash_images(df: DataFrame, bin_col: str = "payload",
                 id_col: str = "item_id", hash_size: int = 8) -> DataFrame:
    """Perceptual average-hash over PNM payloads — the image-side near-
    dedup signature (aHash; same family as pHash/dHash): decode → integer
    grayscale → hash_size² nearest-neighbor samples → threshold at the
    integer mean → one bit per cell. EVERY step is integer arithmetic
    (channel mean (r+g+b)//3, grid index (r·h)//hs, mean sum//n), so the
    hash is bit-identical across platforms and reproducible in a SQL
    oracle over synthesized rasters. The 64-bit hash ships as two
    non-negative 32-bit halves (hash_hi, hash_lo) so neither engine's
    BIGINT arithmetic can overflow.

    Scale shape: one Arrow-batched pass over the payload column; the
    blob never survives past the kernel. Near-dup candidates then come
    from band equality (ahash_pairs), not an all-pairs scan."""
    import pyspark.sql.types as T
    hs = hash_size
    # Even sizes only (the two halves must split the grid evenly) and
    # ≤10 (half = hs²/2 must fit a non-negative 63-bit shift range);
    # validating up-front keeps parameter errors OUT of the kernel's
    # decode-failure except, which would silently NULL every hash.
    if hs % 2 != 0 or not 2 <= hs <= 10:
        raise ValueError(f"hash_size must be even and in [2, 10], "
                         f"got {hs}")
    out_schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("hash_hi", T.LongType()),
        T.StructField("hash_lo", T.LongType()),
    ])

    def kernel(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    arr = decode_pnm(bytes(p))
                    if arr.dtype.itemsize != 1:
                        raise ValueError("16-bit PNM unsupported")
                    a = arr.astype(np.int64)
                    if a.ndim == 3:
                        a = (a[:, :, 0] + a[:, :, 1] + a[:, :, 2]) // 3
                    h, w = a.shape
                    ys = (np.arange(hs) * h) // hs
                    xs = (np.arange(hs) * w) // hs
                    grid = a[np.ix_(ys, xs)].ravel()
                    mean = int(grid.sum()) // (hs * hs)
                    bits = (grid > mean).astype(np.int64)
                    half = (hs * hs) // 2
                    hi = int(sum(int(b) << (half - 1 - q)
                                 for q, b in enumerate(bits[:half])))
                    lo = int(sum(int(b) << (half - 1 - q)
                                 for q, b in enumerate(bits[half:])))
                    rows.append((int(i), w, h, hi, lo))
                except Exception:
                    rows.append((int(i), None, None, None, None))
            yield pd.DataFrame(rows, columns=["item_id", "width", "height",
                                              "hash_hi", "hash_lo"])

    return df.select(id_col, bin_col).mapInPandas(kernel, out_schema)


def ahash_pairs(hashes: DataFrame, max_hamming: int = 3,
                id_col: str = "item_id", hash_size: int = 8) -> DataFrame:
    """Near-duplicate image pairs from ahash_images output: band each
    hash half into two equal keys (4 bands total — 16 bits each at the
    default hash_size=8) and equi-join on band equality, then verify
    exact hamming ≤ max_hamming via bit_count(xor). Pigeonhole
    guarantee: a pair within hamming ≤ 3 differs in at most 3 of the 4
    bands, so at least one band matches — banded recall is EXACT for
    max_hamming ≤ 3 (larger thresholds need more/narrower bands). Pass
    the SAME hash_size as ahash_images: band boundaries derive from it,
    and a mismatch would either lose recall or degenerate buckets to
    all-pairs. The quadratic work is per-band-bucket, never all-pairs."""
    if max_hamming > 3:
        raise ValueError("4-band banding is exact only for "
                         "max_hamming <= 3")
    if hash_size % 2 != 0 or not 2 <= hash_size <= 10:
        raise ValueError(f"hash_size must be even and in [2, 10], "
                         f"got {hash_size}")
    half = (hash_size * hash_size) // 2
    shift, mod = half - half // 2, 1 << (half - half // 2)
    h = hashes.filter(F.col("hash_hi").isNotNull())
    bands = h.select(
        F.col(id_col), "hash_hi", "hash_lo",
        F.explode(F.array(
            F.concat(F.lit("0:"), F.shiftright("hash_hi", shift)),
            F.concat(F.lit("1:"), F.col("hash_hi") % mod),
            F.concat(F.lit("2:"), F.shiftright("hash_lo", shift)),
            F.concat(F.lit("3:"), F.col("hash_lo") % mod),
        )).alias("band"))
    a = bands.select(F.col(id_col).alias("id_a"),
                     F.col("hash_hi").alias("hi_a"),
                     F.col("hash_lo").alias("lo_a"), "band")
    b = bands.select(F.col(id_col).alias("id_b"),
                     F.col("hash_hi").alias("hi_b"),
                     F.col("hash_lo").alias("lo_b"), "band")
    ham = (F.bit_count(F.expr("hi_a ^ hi_b"))
           + F.bit_count(F.expr("lo_a ^ lo_b")))
    return (a.join(b, on="band")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", ham.alias("hamming"))
             .distinct()
             .filter(F.col("hamming") <= max_hamming))
