"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The image/audio decode libraries are NOT in this container, so the
decode step is a STUB — ``decode_image_stub`` produces a deterministic
fake (dimensions + a tiny feature vector derived from the bytes). The
Spark-side plumbing is real and tested: binary column schema, typed
metadata struct, mapInPandas batch shape, partition-preserving flow.
Swap ``_fake_decode`` for a PIL/libvips call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "features array<float>"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + metadata (the testdata ships
    no real media; in production this is the Iceberg binary column)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
             .when(F.col("doc_id") % 3 == 1, "audio/wav")
             .otherwise("video/mp4").alias("media_type"),
            F.length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims + 8-d feature from md5(payload).

    Raises nothing here; a REAL decoder goes behind this seam. If you
    need the honest failure mode instead, use decode_strict=True below.
    """
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feats = (np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0)
    return width, height, [float(x) for x in feats]


def png_bytes(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal VALID solid-color RGB PNG, pure stdlib (public PNG spec:
    8-byte signature + IHDR + one zlib IDAT of filter-0 scanlines +
    IEND). Lets fixtures carry REAL image payloads — decodable by any
    codec (Pillow included) — without shipping binary test assets or
    needing an image library to generate them."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + bytes(rgb) * width) * height
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def attach_png_media(docs: DataFrame) -> DataFrame:
    """Attach a REAL deterministic PNG payload per doc (vs
    attach_fake_media's opaque text bytes): dimensions and solid color
    are pure functions of doc_id, so a real decoder's output is exactly
    predictable (pytest pins the Pillow channel means). Arrow-batched
    pandas construction — the PNG encode is the honest Python-boundary
    work, one batch at a time."""
    import pandas as pd  # noqa: F811

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(lambda i: png_bytes(
            4 + int(i) % 5, 3 + int(i) % 4,
            ((int(i) * 37) % 256, (int(i) * 59) % 256,
             (int(i) * 83) % 256)))

    return (docs
            .select("doc_id", _payload(F.col("doc_id")).alias("payload"))
            .select("doc_id", "payload",
                    F.struct(F.lit("image/png").alias("media_type"),
                             F.octet_length("payload").alias("n_bytes"))
                    .alias("meta")))


def pil_available() -> bool:
    """True when a real image codec (Pillow) is importable at runtime."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decode via Pillow: dimensions + an 8-d feature (RGB channel
    means, global std, padded). Executor-side import — the worker that
    runs the batch must have Pillow, which pil_available() gates on the
    driver (same site-packages in local mode; on a real cluster ship it
    via --py-files/conda env)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    feats = [float(x) for x in arr.mean(axis=(0, 1))] + [float(arr.std())]
    feats += [0.0] * (8 - len(feats))
    return int(w), int(h), feats[:8]


def decode_media(media: DataFrame, decode_strict: bool = False,
                 decoder: str = "stub") -> DataFrame:
    """mapInPandas decode/feature-extract.

    ``decoder``: "stub" (default — deterministic fake, oracle-paired),
    "pil" (real Pillow decode of actual image payloads), or "auto"
    (pil when importable, stub otherwise). decode_strict=True raises
    NotImplementedError when no real codec is available, the honest
    failure mode."""
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder not in ("stub", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requested but Pillow is not importable")
    decode_fn = _pil_decode if decoder == "pil" else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_strict and decode_fn is _fake_decode:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in container")
            decoded = pdf["payload"].map(decode_fn)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]).astype("int32"),
                "width": decoded.map(lambda d: d[0]).astype("int32"),
                "height": decoded.map(lambda d: d[1]).astype("int32"),
                "features": decoded.map(lambda d: d[2]),
            })

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """'Frame sampling' shape: one output row per sampled frame index —
    pure relational explode, real at any scale; frame *content* decode
    is behind the stub seam above."""
    n_frames = (F.length("payload") / every_n).cast("int")
    return media.select(
        "doc_id", F.col("meta.media_type").alias("media_type"),
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
        .alias("frame_idx"),
    ).withColumn("frame_key", F.concat_ws(":", "doc_id", "frame_idx"))


RESIZED_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                  "out_w int, out_h int, resized_fp string")


def resize_media(media: DataFrame, max_side: int = 32,
                 strict: bool = False, decoder: str = "stub") -> DataFrame:
    """mapInPandas resize: aspect-preserving target dimensions computed
    with EXACT integer math from the decoded source dims —
    DOWNSCALE-ONLY, the standard max-side semantic: the effective
    target is min(max_side, max(w, h)), so media already smaller than
    max_side keeps its dimensions instead of being upscaled; out =
    max(1, dim * eff // max(w, h)).

    ``decoder`` as in decode_media: "stub" (default — fake dims from
    md5, fingerprint stands in for the resized payload; oracle-paired),
    "pil" (REAL Pillow decode + LANCZOS resample of actual image
    payloads; fingerprint = md5 of the resized RGB pixel bytes), or
    "auto". ``strict=True`` on the stub raises — the honest no-codec
    failure mode.

    Scale: map-only mapInPandas over the media scan, no shuffle."""
    if decoder == "auto":
        decoder = "pil" if pil_available() else "stub"
    if decoder not in ("stub", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requested but Pillow is not importable")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decoder == "pil":
                import io

                from PIL import Image
                recs = []
                for doc_id, payload, meta in zip(
                        pdf["doc_id"], pdf["payload"], pdf["meta"]):
                    img = Image.open(io.BytesIO(payload))
                    img.load()
                    w0, h0 = img.size
                    m0 = max(w0, h0)
                    eff0 = min(max_side, m0)
                    ow = max(1, (w0 * eff0) // m0)
                    oh = max(1, (h0 * eff0) // m0)
                    resized = img.convert("RGB").resize(
                        (ow, oh), Image.LANCZOS)
                    recs.append((doc_id, meta["media_type"], w0, h0, ow, oh,
                                 hashlib.md5(resized.tobytes()).hexdigest()))
                yield pd.DataFrame(recs, columns=[
                    "doc_id", "media_type", "width", "height",
                    "out_w", "out_h", "resized_fp"])
                continue
            if strict:
                raise NotImplementedError(
                    "real pixel resampling requires PIL/libvips — "
                    "not in container")
            decoded = pdf["payload"].map(_fake_decode)
            w = decoded.map(lambda d: d[0]).to_numpy()
            h = decoded.map(lambda d: d[1]).to_numpy()
            m = np.maximum(w, h)
            eff = np.minimum(max_side, m)
            out_w = np.maximum(1, (w * eff) // m).astype("int32")
            out_h = np.maximum(1, (h * eff) // m).astype("int32")
            fp = [hashlib.md5(f"{i}:{a}:{b}".encode()).hexdigest()
                  for i, a, b in zip(pdf["doc_id"], out_w, out_h)]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["meta"].map(lambda x: x["media_type"]),
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "out_w": out_w,
                "out_h": out_h,
                "resized_fp": fp,
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def phash_media(media: DataFrame) -> DataFrame:
    """Perceptual-hash fingerprints of media payloads, chunked for the
    hamming band join: 64 deterministic "pixels" per payload (with the
    stub decoder: bytes 0-7 of md5(payload || k) for k = 1..8 — swap
    for a real 8x8 grayscale downsample behind the same seam), bit i =
    pixel_i strictly above the pixel mean (compared exactly as
    pixel*64 > sum so no float mean can diverge between engines), the
    64 bits packed little-endian into four unsigned 16-bit chunks
    c0..c3 — the SAME chunked shape ``dedup.simhash_near_pairs_chunks``
    consumes, so media near-dup reuses the pigeonhole candidate join
    (any pair within hamming 16·(4-1)/4 shares at least one equal
    chunk; looser thresholds still verify exactly on candidates).

    Scale shape: one Arrow-batched mapInPandas map — no shuffle; the
    pair generation downstream is the bucketed equi-join, never
    all-pairs.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"doc_id": pdf["doc_id"]}
            chunks = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                px = np.frombuffer(
                    b"".join(hashlib.md5(raw + bytes([k])).digest()[:8]
                             for k in range(1, 9)),
                    dtype=np.uint8).astype(np.int64)
                bits = (px * 64 > int(px.sum())).astype(np.int64)
                cs = [int((bits[i * 16:(i + 1) * 16]
                           << np.arange(16)).sum()) for i in range(4)]
                chunks.append(cs)
            arr = np.array(chunks, dtype=np.int32).reshape(len(chunks), 4)
            for i in range(4):
                out[f"c{i}"] = arr[:, i]
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, schema="doc_id long, c0 int, c1 int, c2 int, c3 int")
