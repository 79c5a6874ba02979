"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs, processed by Arrow-batched UDFs over
``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual codec work is stubbed
behind ``DecodeUnavailable`` / a deterministic fake because no
image/audio libraries ship in this container — swap `_decode_*_real`
in when Pillow/torchaudio/PyAV are present.

Analog in the reference: per-volume image lists with width/height
metadata (/root/reference/il-cache/, loader utils.php:199-209) and the
pagination->image join (migrate-bvm.py:95-156) — media as records with
metadata, bytes processed elsewhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("meta", IMAGE_META),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha string, feature array<float>"
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path when codec libs are absent."""


try:  # optional codec: used automatically when Pillow is installed
    from PIL import Image as _PILImage
except ImportError:  # this container ships no image libs
    _PILImage = None


def _decode_image_real(payload: bytes, dim: int = 8) -> list[float]:
    """Real decode path: when Pillow is importable, decode the payload
    and emit a dim-length grayscale thumbnail feature (resize to
    (dim, 1), normalized pixel row) — same length/dtype contract as
    the deterministic fake, so swapping paths never changes the Arrow
    batch shape. Without Pillow, DecodeUnavailable."""
    if _PILImage is None:
        raise DecodeUnavailable(
            "image decoding requires Pillow — not in this container; "
            "install Pillow and this path activates with the same "
            "batch shape as the fake"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [p / 255.0 for p in img.getdata()]


def _feature_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: sha256-derived floats. Keeps the
    whole distributed path (partitioning, Arrow batches, downstream
    similarity joins) testable without codecs."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_media_features(
    media: DataFrame, dim: int = 8, use_real_decode: bool = False
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item features via mapInPandas.

    Column pruning keeps metadata out of the Arrow transfer; payload
    bytes move once. Partitioning: caller should repartition by
    bucket(media_id) so batches are size-uniform (payloads skew)."""
    src = media.select("media_id", "kind", "payload")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"].values:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest()[:16])
                if use_real_decode:
                    feats.append(_decode_image_real(b, dim))
                else:
                    feats.append(_feature_fake(b, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "sha": shas,
                "feature": feats,
            })

    return src.mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    tests/bench — no external data."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 7)
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, bytearray(payload), (64 + i, 48 + i, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, n_bytes int, sha string"

try:  # optional codec: used automatically when PyAV is installed
    import av as _pyav  # noqa: F401
except ImportError:  # this container ships no video libs
    _pyav = None


def sample_video_frames(
    media: DataFrame,
    every_n: int = 5,
    frame_bytes: int = 256,
    use_real_decode: bool = False,
) -> DataFrame:
    """Frame sampling over video payloads via mapInPandas: emit every
    ``every_n``-th frame as its own row (media_id, frame_idx, n_bytes,
    sha). The kind filter and column pruning run JVM-side BEFORE the
    Arrow boundary, so only video payload bytes cross once; output is
    one narrow row per SAMPLED frame — the downstream shape for
    per-frame feature extraction / dedup at 100 TB.

    Real decode (``use_real_decode=True``) demuxes the payload with
    PyAV — every ``every_n``-th decoded frame is emitted as grayscale
    pixel bytes (frame_idx = decode-order index, so sampling stays
    aligned across GOP boundaries regardless of keyframe placement);
    DecodeUnavailable when the codec lib is absent. The deterministic
    fake treats the payload as a sequence of ``frame_bytes``-sized
    records. Both paths share the schema and batch contract, so
    swapping them never changes the plan."""
    src = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def real_frames(b: bytes) -> list[tuple[int, bytes]]:
        """(frame_idx, gray8 bytes) for every every_n-th decoded frame
        via PyAV container demux over the first video stream."""
        import io

        out: list[tuple[int, bytes]] = []
        with _pyav.open(io.BytesIO(b)) as container:
            stream = container.streams.video[0]
            stream.thread_type = "AUTO"
            fi = 0
            for frame in container.decode(stream):
                if fi % every_n == 0:
                    out.append(
                        (fi, frame.to_ndarray(format="gray").tobytes())
                    )
                fi += 1
        return out

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, shas = [], [], [], []
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                b = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    if _pyav is None:
                        raise DecodeUnavailable(
                            "video frame decoding requires PyAV — not in "
                            "this container; install av and this path "
                            "activates with the same output schema"
                        )
                    for fi, fb in real_frames(b):
                        ids.append(int(media_id))
                        idxs.append(fi)
                        sizes.append(len(fb))
                        shas.append(
                            hashlib.sha256(fb).hexdigest()[:16])
                    continue
                frames = [
                    b[o: o + frame_bytes]
                    for o in range(0, len(b), frame_bytes)
                ]
                for fi in range(0, len(frames), every_n):
                    ids.append(int(media_id))
                    idxs.append(fi)
                    sizes.append(len(frames[fi]))
                    shas.append(
                        hashlib.sha256(frames[fi]).hexdigest()[:16])
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_bytes": pd.Series(sizes, dtype="int32"),
                "sha": pd.Series(shas, dtype="object"),
            })

    return src.mapInPandas(per_batch, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, format string"
)


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    use_real_decode: bool = False,
) -> DataFrame:
    """Image resize over mapInPandas: (media_id, payload') with the
    target dimensions stamped as typed metadata. Kind filter and
    column pruning run JVM-side, so only image payloads cross the
    Arrow boundary, and the output payload is bounded by
    width*height bytes per row — the transform that turns a skewed
    raw-bytes column into a fixed-budget one before feature
    extraction or storage.

    With Pillow present (``use_real_decode=True``) the payload is
    decoded, resized to (width, height) grayscale, and re-emitted as
    raw pixel bytes; without codecs the deterministic fake strides
    the input bytes down to exactly width*height samples (numpy
    index, no Python loop per byte). Both paths share RESIZED_SCHEMA,
    so swapping them never changes the plan."""
    import numpy as np

    src = media.filter(F.col("kind") == "image").select("media_id", "payload")
    n_out = width * height

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts = [], []
            for payload in pdf["payload"].values:
                b = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    if _PILImage is None:
                        raise DecodeUnavailable(
                            "image resize requires Pillow — not in this "
                            "container; install Pillow and this path "
                            "activates with the same output schema"
                        )
                    import io

                    img = (
                        _PILImage.open(io.BytesIO(b))
                        .convert("L")
                        .resize((width, height))
                    )
                    payloads.append(img.tobytes())
                    fmts.append("gray8")
                else:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    if arr.size == 0:
                        payloads.append(b"\x00" * n_out)
                    else:
                        idx = np.linspace(
                            0, arr.size - 1, n_out
                        ).astype(np.int64)
                        payloads.append(arr[idx].tobytes())
                    fmts.append("fake8")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "payload": payloads,
                "width": pd.Series([width] * len(payloads), dtype="int32"),
                "height": pd.Series([height] * len(payloads), dtype="int32"),
                "format": fmts,
            })

    return src.mapInPandas(per_batch, schema=RESIZED_SCHEMA)
