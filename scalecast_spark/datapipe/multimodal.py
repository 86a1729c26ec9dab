"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real — schema, partition sizing, Arrow batch
shape via ``mapInPandas``. Codec status per modality:

  * audio: REAL — WAV/PCM16 parses with stdlib ``wave`` + numpy, no
    external codec (``extract_audio_features``: sample rate, duration,
    RMS, zero-crossing rate; corrupt payloads yield NULLs);
  * image decode: import-gated on Pillow (``pil_decode``); the
    deterministic ``fake_decode`` keeps every downstream operator
    (features, thumbnails) testable codec-free, and the
    nearest-neighbor resize is pure numpy so thumbnailing is real
    end-to-end under either decoder;
  * video: represented as (video_id, frame_idx, payload) frame tables;
    ``sample_frames`` prunes before any decode.

Scale notes: binary payloads ride the scan; ``mapInPandas`` streams
Arrow record batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; keep
``maxPartitionBytes`` modest (128 MB) when payload rows are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Cheap scan-side metadata: byte length + md5 content id. Pure JVM
    expressions — no decode required."""
    return df.withColumn("payload_bytes", F.length(F.col(bin_col)).cast("long")).withColumn(
        "content_id", F.md5(F.col(bin_col))
    )


def pil_decode(raw: bytes) -> np.ndarray:
    """Real image decode via Pillow when installed (import-gated; this
    container ships without codecs). Returns (h, w, c) uint8."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "image decode requires Pillow; pass decode=fake_decode for "
            "codec-free pipeline tests"
        ) from e
    import io

    img = Image.open(io.BytesIO(raw)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _decode_image_bytes(raw: bytes) -> np.ndarray:
    """Default real-decode hook: Pillow when present, informative
    NotImplementedError otherwise."""
    return pil_decode(raw)


def default_decode():
    """Deployment-config decoder selection, resolved once per call:

    * ``SCALECAST_SPARK_IMAGE_DECODE=pil``  — force Pillow (raises at
      decode time if Pillow is absent, so a mis-provisioned cluster
      fails loudly instead of silently producing fake features);
    * ``SCALECAST_SPARK_IMAGE_DECODE=fake`` — force the deterministic
      stand-in (codec-free CI legs);
    * unset / ``auto`` — Pillow when importable, else the fake.

    Operators accept ``decode=None`` to mean "use this resolution";
    passing a callable always wins over the env var.

    CLUSTER CAVEAT: ``auto`` probes Pillow on the DRIVER, but the
    chosen callable executes on executors — on a cluster whose driver
    and executor images differ, auto can silently pick the fake (or
    pick Pillow and fail at task time). Production deployments should
    pin ``SCALECAST_SPARK_IMAGE_DECODE=pil`` (fails loudly when an
    executor lacks the codec) or pass the decoder explicitly; ``auto``
    is for local / uniform-image environments.
    """
    import importlib.util
    import os

    mode = os.environ.get("SCALECAST_SPARK_IMAGE_DECODE", "auto").lower()
    if mode == "pil":
        return pil_decode
    if mode == "fake":
        return fake_decode
    if mode != "auto":
        raise ValueError(
            f"SCALECAST_SPARK_IMAGE_DECODE must be auto|pil|fake, got {mode!r}"
        )
    return pil_decode if importlib.util.find_spec("PIL") else fake_decode


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize as pure numpy index arithmetic — no
    image library needed once pixels are decoded."""
    src_h, src_w = img.shape[0], img.shape[1]
    rows = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    cols = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[rows][:, cols]


def fake_decode(raw: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decoder: expands md5(raw) into an (h,w,c)
    uint8 array. Lets the full pipeline (batching, schema, feature
    extraction shape) run and be tested without codecs."""
    seed = hashlib.md5(raw).digest()
    reps = (h * w * c) // len(seed) + 1
    buf = (seed * reps)[: h * w * c]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)


def extract_image_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decode=None,
) -> DataFrame:
    """Decode → per-channel mean/std features via mapInPandas.

    Output: (id, feat array<double> of 2*channels). ``decode=None``
    resolves via :func:`default_decode` (env-switchable); pass a
    callable to override — the Spark plumbing is identical either way.
    """
    if decode is None:
        decode = default_decode()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for raw in pdf[bin_col]:
                # NULL / undecodable payloads emit a NULL-feat row
                # instead of killing the task (same policy as
                # make_thumbnails / extract_audio_features)
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    img = decode(bytes(raw))
                    per_c = img.reshape(-1, img.shape[-1]).astype(float)
                    feats.append(
                        list(per_c.mean(axis=0)) + list(per_c.std(axis=0))
                    )
                except Exception:
                    feats.append(None)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "feat": feats})

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def make_thumbnails(
    df: DataFrame,
    h: int = 32,
    w: int = 32,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decode=None,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit fixed-size uint8
    thumbnails as a binary column + shape metadata. The resize is pure
    numpy index math, so the whole operator is real today with the
    deterministic fake decoder and unchanged under a real codec.
    Output: (id, thumb binary h*w*c, thumb_h, thumb_w, thumb_c).
    NULL or undecodable payloads yield a row with NULL thumb fields
    (the id survives so a later join can flag the failures).
    ``decode=None`` resolves via :func:`default_decode`."""
    if decode is None:
        decode = default_decode()
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("thumb_h", T.IntegerType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_c", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs, hs, ws_, chans = [], [], [], []
            for raw in pdf[bin_col]:
                # NULL / undecodable payloads emit a NULL-thumb row
                # (id kept, all thumb fields NULL) instead of killing
                # the task — curation data is dirty by definition
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    img = decode(bytes(raw))
                    if img.ndim == 2:  # grayscale decoders return (h, w)
                        img = img[:, :, None]
                    thumbs.append(resize_nearest(img, h, w).tobytes())
                    hs.append(h)
                    ws_.append(w)
                    chans.append(int(img.shape[2]))
                except Exception:
                    thumbs.append(None)
                    hs.append(None)
                    ws_.append(None)
                    chans.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "thumb": thumbs,
                    "thumb_h": pd.array(hs, dtype="Int32"),
                    "thumb_w": pd.array(ws_, dtype="Int32"),
                    "thumb_c": pd.array(chans, dtype="Int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def extract_audio_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL audio feature extraction for WAV/PCM payloads — stdlib
    ``wave`` parses the container and numpy decodes PCM16, so unlike
    the image path this needs NO external codec. Per clip: sample rate,
    channel count, duration, RMS level, and zero-crossing rate (the
    classic cheap voice/music/noise discriminators for corpus triage).
    Non-WAV / corrupt payloads yield NULL features instead of failing
    the batch (curation data is dirty by definition)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_cross_rate", T.DoubleType()),
        ]
    )

    def one(raw: bytes):
        import io
        import wave

        # EVERYTHING inside the try: a header can declare framerate 0
        # or 0 channels, and truncated PCM makes the reshape fail —
        # all must degrade to NULLs, not kill the task
        try:
            with wave.open(io.BytesIO(raw)) as wf:
                if wf.getsampwidth() != 2:  # PCM16 only
                    return (None, None, None, None, None)
                sr = wf.getframerate()
                nch = wf.getnchannels()
                n = wf.getnframes()
                if sr <= 0 or nch <= 0:
                    return (None, None, None, None, None)
                pcm = np.frombuffer(
                    wf.readframes(n), dtype="<i2"
                ).astype(np.float64) / 32768.0
            if len(pcm) == 0:
                return (sr, nch, 0.0, None, None)
            pcm = pcm[: (len(pcm) // nch) * nch]  # drop a torn last frame
            mono = pcm.reshape(-1, nch).mean(axis=1)
            rms = float(np.sqrt(np.mean(mono * mono)))
            zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            return (sr, nch, round(n / sr, 6), round(rms, 6), round(zcr, 6))
        except Exception:
            return (None, None, None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads short-circuit before bytes() — a None raw
            # would TypeError outside one()'s try and kill the task
            rows = [
                one(bytes(raw)) if raw is not None else (None,) * 5
                for raw in pdf[bin_col]
            ]
            out = pd.DataFrame(
                rows,
                columns=[
                    "sample_rate", "n_channels", "duration_sec", "rms",
                    "zero_cross_rate",
                ],
            )
            out.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield out

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_idx_col: str = "frame_idx",
) -> DataFrame:
    """Frame sampling for video tables keyed (video_id, frame_idx,
    payload): keep every n-th frame. Pure filter — prunes before any
    decode, pushed to the scan."""
    return df.filter((F.col(frame_idx_col) % every_n) == 0)


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (float64): row k, col i =
    s_k·cos(π(2i+1)k/2n), s_0=√(1/n), s_k=√(2/n). Matrix form keeps
    the transform deterministic and dependency-free."""
    k = np.arange(n)[:, None].astype(float)
    i = np.arange(n)[None, :].astype(float)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


def phash_of_image(img: np.ndarray, hash_size: int = 8, img_size: int = 32) -> int:
    """64-bit perceptual hash of one decoded image (the classic pHash
    recipe, as popularized by the imagehash library): grayscale →
    ``img_size``² nearest-neighbor resize → 2D DCT-II → keep the
    top-left ``hash_size``² low-frequency block → threshold at its
    median → row-major bit pack (MSB first) into a SIGNED 64-bit int
    (Spark LongType-compatible)."""
    g = img.astype(float)
    if g.ndim == 3:
        g = g.mean(axis=2)
    rows = (np.arange(img_size) * g.shape[0] // img_size).clip(0, g.shape[0] - 1)
    cols = (np.arange(img_size) * g.shape[1] // img_size).clip(0, g.shape[1] - 1)
    g = g[rows][:, cols]
    D = _dct_mat(img_size)
    low = (D @ g @ D.T)[:hash_size, :hash_size]
    bits = (low > np.median(low)).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def phash_images(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decode=None,
    hash_size: int = 8,
) -> DataFrame:
    """Per-image perceptual hash column (``phash``, signed 64-bit;
    NULL for null/undecodable payloads): Arrow-batched mapInPandas —
    decode + two small GEMMs per image, scan-side, no shuffle. The
    near-dup join then runs on 8-byte hashes via Hamming pigeonhole
    buckets (dedup.hamming_near_pairs) — images themselves never
    shuffle. ``decode=None`` resolves via :func:`default_decode`."""
    import pandas as pd
    from pyspark.sql import types as T

    if decode is None:
        decode = default_decode()
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for raw in pdf[bin_col]:
                try:
                    if raw is None:
                        raise ValueError("null payload")
                    hashes.append(phash_of_image(decode(bytes(raw)), hash_size))
                except Exception:
                    hashes.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "phash": hashes}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema)


def phash_near_dup(
    df: DataFrame,
    max_hamming: int = 6,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decode=None,
) -> DataFrame:
    """Image near-duplicate pairs: pHash + Hamming pigeonhole buckets
    (perceptually-similar images — recompressed, slightly resized,
    minor edits — land within a few bits). Returns
    (id_a, id_b, hamming). Sub-quadratic: the pair join runs on
    (max_hamming+1)-banded 8-byte hashes, never on pixels."""
    from scalecast_spark.datapipe.dedup import hamming_near_pairs

    hashes = phash_images(df, bin_col, id_col, decode).filter(
        F.col("phash").isNotNull()
    )
    return hamming_near_pairs(hashes, "phash", id_col, 64, max_hamming)
