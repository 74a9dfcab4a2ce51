"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The container has no image/audio codecs, so the decode step is a clearly
marked stub (deterministic fake) — but the Spark-side shape is real and
tested: binary payload column + struct metadata, Arrow-batched `mapInPandas`
with a bounded batch size (decode memory ∝ batch × payload), and partition
sizing by byte size rather than row count (`spark.sql.files.maxPartitionBytes`
is what balances 100 TB of blobs, not row counts).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def to_binary_table(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Model a documents table as a multimodal blob table: payload bytes +
    typed metadata struct. (Real ingestion reads blob files via
    `spark.read.format('binaryFile')` — same shape.)"""
    payload = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def binary_meta(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Deterministic metadata extraction over the binary payload — byte length
    + md5 checksum. Pure JVM expressions (oracle-checkable)."""
    payload = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image decode via mapInPandas: REAL for PNG, BMP, GIF, and baseline
    JPEG payloads (magic-dispatched to the pure-Python codecs in sources/),
    deterministic fake for anything else (unsupported codecs fall through,
    but the distributed plumbing — Arrow batches, schema, partitioning — is
    identical either way). Poison payloads (bad magic mid-file, truncated
    chunks) fall back to the fake dimensions instead of failing the batch —
    at corpus scale a corrupt blob must never kill the job.
    """
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ophidia_server_spark.sources import bmp, gif, png
        from ophidia_server_spark.sources import jpeg as jpg

        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"], "n_bytes": [], "checksum": [],
                    "width": [], "height": []}
            for b in pdf[payload_col]:
                raw = bytes(b)
                rows["n_bytes"].append(len(raw))
                rows["checksum"].append(hashlib.md5(raw).hexdigest())
                wd = ht = None
                try:
                    if raw[:8] == png.MAGIC:
                        img = png.decode(raw)
                        ht, wd = img.shape[0], img.shape[1]
                    elif raw[:2] == bmp.MAGIC:
                        img = bmp.decode(raw)
                        ht, wd = img.shape[0], img.shape[1]
                    elif raw[:6] in (gif.MAGIC87, gif.MAGIC89):
                        d = gif.decode(raw)
                        wd, ht = d["width"], d["height"]
                    elif raw[:2] == jpg.MAGIC:
                        img = jpg.decode(raw)
                        ht, wd = img.shape[0], img.shape[1]
                except Exception:  # noqa: BLE001 - poison payloads raise
                    # struct.error/IndexError from truncated containers, not
                    # just ValueError; a corrupt blob must never kill the job
                    wd = ht = None
                if wd is None:
                    # deterministic fake for non-decodable payloads
                    wd, ht = len(raw) % 640, len(raw) % 480
                rows["width"].append(wd)
                rows["height"].append(ht)
            out = pd.DataFrame(rows)
            out["n_bytes"] = out["n_bytes"].astype("int64")
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return df.mapInPandas(decode, DECODE_SCHEMA)


def decode_resize_png(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL decode -> resize pipeline for PNG payloads: sources/png.py
    decodes inside the task, the same nearest-neighbor index math as
    resize_raw_rgb resamples to (out_h, out_w), and the resized RGB bytes
    come back with ok=1. Non-PNG / corrupt payloads yield ok=0 rows."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ophidia_server_spark.sources import png

        ys_cache: dict[tuple[int, int], np.ndarray] = {}

        def axis(n_src: int, n_out: int) -> np.ndarray:
            k = (n_src, n_out)
            if k not in ys_cache:
                ys_cache[k] = (np.arange(n_out) * n_src // n_out).astype("int64")
            return ys_cache[k]

        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"], "ok": [], "width": [], "height": [],
                    "resized": []}
            for b in pdf[payload_col]:
                raw = bytes(b)
                try:
                    img = png.decode(raw)
                except ValueError:
                    rows["ok"].append(0)
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["resized"].append(b"")
                    continue
                if img.shape[2] == 1:  # grayscale -> RGB for a uniform sink
                    img = np.repeat(img, 3, axis=2)
                img = img[:, :, :3]  # drop alpha
                small = img[np.ix_(axis(img.shape[0], out_h), axis(img.shape[1], out_w))]
                rows["ok"].append(1)
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["resized"].append(small.tobytes())
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id long, ok int, width int, height int, resized binary"
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64, payload_col: str = "payload") -> DataFrame:
    """STUB video frame sampling: emit one row per sampled offset of each
    payload (real impl: per-frame decode). Shows the explode-style fan-out
    shape with bounded output per input row."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select(
        "doc_id",
        F.posexplode(offsets).alias("frame_no", "byte_offset"),
    )


def audio_chunk(
    df: DataFrame, window_bytes: int = 128, hop_bytes: int = 64,
    payload_col: str = "payload",
) -> DataFrame:
    """STUB audio chunking: overlapping windows (hop < window, the STFT frame
    shape) over each payload, emitting (chunk_no, start, length) with the tail
    window truncated at the payload end. Real impl: per-chunk PCM decode +
    feature UDF; the fan-out, bounded-output-per-row plumbing is the tested
    part.
    """
    n = F.octet_length(F.col(payload_col))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(hop_bytes))
    out = df.select(
        "doc_id", n.alias("__n"), F.posexplode(starts).alias("chunk_no", "start_byte")
    )
    return out.select(
        "doc_id",
        "chunk_no",
        "start_byte",
        F.least(F.lit(window_bytes), F.col("__n") - F.col("start_byte")).alias("chunk_len"),
    )


def resize_raw_rgb(
    df: DataFrame, src_w: int, src_h: int, out_w: int, out_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize over raw (uncompressed) RGB payloads — no codec
    needed: the payload is interpreted as src_h x src_w x 3 bytes and
    resampled with nearest-neighbor index math in numpy inside mapInPandas
    (Arrow-batched; the same kernel shape a PIL/torchvision decode would
    slot into). Payloads of the wrong length are passed through with
    ok=0 rather than failing the batch — at corpus scale a poison payload
    must never kill the job.
    """
    import numpy as np
    import pandas as pd

    need = src_w * src_h * 3
    ys = (np.arange(out_h) * src_h // out_h).astype("int64")
    xs = (np.arange(out_w) * src_w // out_w).astype("int64")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"doc_id": pdf["doc_id"], "ok": [], "resized": []}
            for b in pdf[payload_col]:
                raw = bytes(b)
                if len(raw) != need:
                    out_rows["ok"].append(0)
                    out_rows["resized"].append(b"")
                    continue
                img = np.frombuffer(raw, dtype="uint8").reshape(src_h, src_w, 3)
                small = img[np.ix_(ys, xs)]
                out_rows["ok"].append(1)
                out_rows["resized"].append(small.tobytes())
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(resize, "doc_id long, ok int, resized binary")


def decode_wav_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for WAV payloads (pure-Python RIFF/PCM codec,
    sources/wav.py): per-file sample rate, channel count, frame count,
    duration and normalized RMS/peak amplitude — the feature-extraction
    stage an audio corpus pipeline runs after ingest. Arrow-batched
    mapInPandas; non-WAV or corrupt payloads come back ok=0 instead of
    failing the batch (poison tolerance at corpus scale)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ophidia_server_spark.sources import wav

        for pdf in batches:
            out = []
            for did, raw in zip(pdf["doc_id"], pdf[payload_col]):
                # build the whole row before committing it: a late failure
                # (rate=0, empty data chunk, ...) must yield ONE ok=0 row,
                # never a half-appended batch that kills the task
                try:
                    samples, rate = wav.decode(bytes(raw))
                    x = samples.astype("float64")
                    if samples.dtype == np.uint8:
                        x = (x - 128.0) / 128.0
                    elif samples.dtype == np.int16:
                        x = x / 32768.0
                    elif samples.dtype == np.int32:
                        x = x / 2147483648.0
                    # no decimal rounding: 8-bit PCM amplitudes are dyadic
                    # rationals, so every sum/square below is exact in IEEE
                    # double and the one division + sqrt are deterministic —
                    # rounding would only ADD cross-engine round-half traps
                    row = (
                        did, 1, int(rate), int(samples.shape[1]),
                        int(samples.shape[0]), samples.shape[0] / rate,
                        float(np.sqrt(np.mean(x * x))),
                        float(np.max(np.abs(x))),
                    )
                except Exception:
                    row = (did, 0, 0, 0, 0, 0.0, 0.0, 0.0)
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=["doc_id", "ok", "sample_rate", "n_channels",
                         "n_frames", "duration_s", "rms", "peak"],
            )

    return df.mapInPandas(
        run,
        "doc_id long, ok int, sample_rate long, n_channels long, "
        "n_frames long, duration_s double, rms double, peak double",
    )


def decode_bmp_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode for BMP payloads (pure-Python 24-bit BI_RGB codec,
    sources/bmp.py): width/height from the actual header plus the integer
    pixel sum — an exact, float-free feature so the whole decode chain can
    be hash-verified against the source bytes. Poison payloads come back
    ok=0 (corpus-scale tolerance)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ophidia_server_spark.sources import bmp

        for pdf in batches:
            out = []
            for did, raw in zip(pdf["doc_id"], pdf[payload_col]):
                # whole row built before committing (see decode_wav_features)
                try:
                    img = bmp.decode(bytes(raw))
                    row = (did, 1, int(img.shape[1]), int(img.shape[0]),
                           int(img.astype(np.int64).sum()))
                except Exception:
                    row = (did, 0, 0, 0, 0)
                out.append(row)
            yield pd.DataFrame(
                out, columns=["doc_id", "ok", "width", "height", "sum_rgb"]
            )

    return df.mapInPandas(
        run, "doc_id long, ok int, width long, height long, sum_rgb long"
    )


def decode_gif_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL animated-image decode for GIF payloads (pure-Python 87a/89a
    codec with full LZW, sources/gif.py): frame count, dimensions, total
    animation delay, and the integer pixel sum of the FIRST rendered frame
    — exact, float-free features over the composited output. Poison
    payloads come back ok=0 (corpus-scale tolerance)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ophidia_server_spark.sources import gif

        for pdf in batches:
            out = []
            for did, raw in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    d = gif.decode(bytes(raw))
                    row = (
                        did, 1, int(d["width"]), int(d["height"]),
                        len(d["frames"]),
                        int(sum(d["delays_cs"])),
                        int(d["frames"][0].astype(np.int64).sum()),
                    )
                except Exception:
                    row = (did, 0, 0, 0, 0, 0, 0)
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=["doc_id", "ok", "width", "height", "n_frames",
                         "total_delay_cs", "sum_rgb_f0"],
            )

    return df.mapInPandas(
        run,
        "doc_id long, ok int, width long, height long, n_frames long, "
        "total_delay_cs long, sum_rgb_f0 long",
    )


def decode_jpeg_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL JPEG decode for baseline-sequential payloads (pure-Python
    ITU-T T.81 codec, sources/jpeg.py): dimensions, channel count, integer
    pixel sum, and the rounded mean pixel of the FULL decoded raster —
    exercising the whole chain (Huffman, dequant, IDCT, upsample, color
    transform). Poison payloads come back ok=0 (corpus-scale tolerance),
    including unsupported processes (progressive) whose refusal is a named
    ValueError, not a crash."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ophidia_server_spark.sources import jpeg

        for pdf in batches:
            out = []
            for did, raw in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    img = jpeg.decode(bytes(raw))
                    s = int(img.astype(np.int64).sum())
                    npix = int(img.size)
                    out.append((
                        did, 1, int(img.shape[1]), int(img.shape[0]),
                        int(img.shape[2]), s, int(round(s / npix)),
                    ))
                except Exception:
                    out.append((did, 0, 0, 0, 0, 0, 0))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "ok", "width", "height", "channels",
                         "sum_pixels", "mean_pixel"],
            )

    return df.mapInPandas(
        run,
        "doc_id long, ok int, width long, height long, channels long, "
        "sum_pixels long, mean_pixel long",
    )


def patchify_rgb(
    df: DataFrame, src_w: int, src_h: int, patch: int,
    payload_col: str = "payload",
) -> DataFrame:
    """ViT-style patch extraction over raw RGB frames: split each
    src_h x src_w x 3 payload into (src_h/patch) x (src_w/patch)
    non-overlapping patches and emit one row per patch with its mean
    channel values — the patch-embedding input statistics a vision
    tower's preprocessing computes. Same Arrow-batched mapInPandas shape
    (and the same poison-tolerance contract: wrong-length payloads yield
    ok=0 rows, never a dead batch) as resize_raw_rgb; the real embedding
    projection slots into the numpy kernel unchanged."""
    import numpy as np
    import pandas as pd

    if src_w % patch or src_h % patch:
        raise ValueError(f"{src_w}x{src_h} not divisible by patch {patch}")
    need = src_w * src_h * 3
    py, px = src_h // patch, src_w // patch

    def patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "patch_row": [], "patch_col": [], "ok": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(b)
                if len(raw) != need:
                    rows["doc_id"].append(did)
                    rows["patch_row"].append(-1)
                    rows["patch_col"].append(-1)
                    rows["ok"].append(0)
                    for ch in ("mean_r", "mean_g", "mean_b"):
                        rows[ch].append(0.0)
                    continue
                img = np.frombuffer(raw, dtype="uint8").reshape(src_h, src_w, 3)
                # (py, patch, px, patch, 3) -> per-patch channel means
                grid = img.reshape(py, patch, px, patch, 3).astype("float64")
                means = grid.mean(axis=(1, 3))  # (py, px, 3)
                for r in range(py):
                    for c in range(px):
                        rows["doc_id"].append(did)
                        rows["patch_row"].append(r)
                        rows["patch_col"].append(c)
                        rows["ok"].append(1)
                        rows["mean_r"].append(float(means[r, c, 0]))
                        rows["mean_g"].append(float(means[r, c, 1]))
                        rows["mean_b"].append(float(means[r, c, 2]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        patches,
        "doc_id long, patch_row int, patch_col int, ok int, "
        "mean_r double, mean_g double, mean_b double",
    )


def dhash_gray(
    df: DataFrame, src_w: int = 18, src_h: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual difference hash (the public dHash recipe: downscale to a
    9 x 8 grayscale grid, set bit (r, c) when cell (r, c) is brighter
    than its right neighbor) over raw grayscale payloads — the standard
    64-bit near-duplicate fingerprint for image corpora; equal or
    near-equal codes group crops/re-encodes of the same picture.
    Downscaling is exact block summation (src must be divisible by
    9 x 8), and brighter-than compares integer BLOCK SUMS (equal block
    sizes make the /n mean cancel), so the hash is bit-deterministic and
    recomputable by any engine. Bits pack into two 32-bit words held in
    BIGINTs (the sign_codes convention). Wrong-length payloads yield
    ok=0 rows with NULL codes — the shared poison-tolerance contract.
    One Arrow-batched map, no shuffle."""
    import numpy as np
    import pandas as pd

    if src_w % 9 or src_h % 8:
        raise ValueError(f"{src_w}x{src_h} not divisible by the 9x8 grid")
    need = src_w * src_h
    bw, bh = src_w // 9, src_h // 8

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "ok": [], "code_lo": [], "code_hi": []}
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(b)
                rows["doc_id"].append(did)
                if len(raw) != need:
                    rows["ok"].append(0)
                    rows["code_lo"].append(None)
                    rows["code_hi"].append(None)
                    continue
                img = np.frombuffer(raw, dtype="uint8").reshape(src_h, src_w)
                sums = img.reshape(8, bh, 9, bw).astype("int64").sum(axis=(1, 3))
                bits = (sums[:, :-1] > sums[:, 1:]).astype("int64")  # (8, 8)
                flat = bits.reshape(64)
                lo = int((flat[:32] << np.arange(32, dtype="int64")).sum())
                hi = int((flat[32:] << np.arange(32, dtype="int64")).sum())
                rows["ok"].append(1)
                rows["code_lo"].append(lo)
                rows["code_hi"].append(hi)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        hashes, "doc_id long, ok int, code_lo long, code_hi long"
    )


def dhash_near_dup(
    codes: DataFrame, max_hamming: int = 3, id_col: str = "doc_id",
    max_candidates: int | None = 100_000_000,
    cap_bucket: int | None = None,
    salt_bucket: "int | str | None" = None,
) -> DataFrame:
    """Image near-duplicate pairs from dHash codes — LOSSLESS banded
    search: the 64-bit code (two 32-bit words from `dhash_gray`) splits
    into four 16-bit bands; by pigeonhole, any pair within Hamming
    distance <= 3 (< 4 bands) agrees on at least one WHOLE band, so the
    band-bucket equi-join generates every qualifying pair and the exact
    `bit_count(xor)` verify keeps no false positives. The standard
    crop/re-encode collapse for image corpora, as simhash_pairs is for
    text — but run on the perceptual hash, entirely JVM-side.

    ok=0 rows (undecodable payloads) never pair. Returns
    (id_a, id_b, hamming), id_a < id_b, each pair once.

    Shape at scale: one explode (x4), one bucket-keyed shuffle join,
    distinct, verify. A degenerate corpus where one band value dominates
    (e.g. flat images hashing to 0) degrades to that bucket's product —
    and that hazard is GUARDED, not prose (the sf10 lesson: clone cliques
    put 19.5B candidates behind this join, discoverable only by a side
    probe): the same O(buckets) Σ C(n, 2) pre-pass + named
    BucketCardinalityError + `cap_bucket` contract as
    dedup.minhash_lsh_pairs runs before the self-join. The code table
    (3 longs/row) is persisted so the pre-pass never re-runs an upstream
    decode pipeline."""
    if not 0 <= int(max_hamming) <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] for lossless 4-band search "
            f"(got {max_hamming}); raise the band count for larger radii"
        )
    good = codes.filter(F.col("ok") == 1).select(
        F.col(id_col).alias("__id"), "code_lo", "code_hi"
    )
    if max_candidates is not None or cap_bucket is not None:
        from pyspark.storagelevel import StorageLevel

        good = good.persist(StorageLevel.MEMORY_AND_DISK)
    mask = F.lit(0xFFFF)
    banded = good.select(
        "__id", "code_lo", "code_hi",
        F.posexplode(
            F.array(
                F.col("code_lo").bitwiseAND(mask),
                F.shiftright("code_lo", 16).bitwiseAND(mask),
                F.col("code_hi").bitwiseAND(mask),
                F.shiftright("code_hi", 16).bitwiseAND(mask),
            )
        ).alias("__band", "__val"),
    )
    bucket_cols = ["__band", "__val"]
    from ophidia_server_spark.pipeline.dedup import _bucket_salt, _resolve_salt

    salt_bucket = _resolve_salt(
        banded, bucket_cols, salt_bucket, max_candidates, "dhash_near_dup"
    )
    if salt_bucket is not None:
        banded = banded.withColumn(
            "__salt", _bucket_salt(bucket_cols, "__id", salt_bucket)
        )
        bucket_cols = [*bucket_cols, "__salt"]
    if max_candidates is not None or cap_bucket is not None:
        from ophidia_server_spark.pipeline.dedup import _guard_banded_candidates

        banded = _guard_banded_candidates(
            banded, bucket_cols, "__id", max_candidates, cap_bucket,
            "dhash_near_dup",
        )
    a, b = banded.alias("a"), banded.alias("b")
    ham = (
        F.bit_count(F.col("a.code_lo").bitwiseXOR(F.col("b.code_lo")))
        + F.bit_count(F.col("a.code_hi").bitwiseXOR(F.col("b.code_hi")))
    ).cast("long")
    same_bucket = (
        (F.col("a.__band") == F.col("b.__band"))
        & (F.col("a.__val") == F.col("b.__val"))
    )
    if salt_bucket is not None:
        same_bucket = same_bucket & (F.col("a.__salt") == F.col("b.__salt"))
    out = (
        a.join(
            b,
            same_bucket & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= int(max_hamming))
        .distinct()
    )
    if max_candidates is not None or cap_bucket is not None:
        from ophidia_server_spark.pipeline.dedup import _attach_cleanup

        out = _attach_cleanup(out, good)
    return out
