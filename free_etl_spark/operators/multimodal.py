"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2B
"multimodal columns").

Media lives in DataFrames as opaque ``binary`` columns + typed
metadata, read via Spark's binaryFile source. Everything that can be
JVM-side is (magic-byte sniffing via substring on the binary column);
decode/feature-extraction runs as Arrow-batched ``mapInPandas``.

The actual pixel/sample decode is STUBBED: image/audio libraries are
not in this container, so the decoder registry falls back to a
clearly-marked deterministic fake (derived from the md5 of the bytes)
when PIL/soundfile are unavailable. The Spark-side plumbing — schema,
batch shape, UDF signature, partitioning — is real and tested; swap
``_decode_image_real`` in when the library exists.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# magic prefixes, checked JVM-side on the binary column
_MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "wav": b"RIFF",
    "pdf": b"%PDF",
}


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Landing directory of media files → (path, modificationTime,
    length, content) — Spark's binaryFile source; partitioning follows
    file count, so a 100 TB corpus parallelizes by file."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def with_media_kind(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Magic-byte media-type detection, entirely JVM-side (no UDF):
    substring on the binary column compared against known prefixes."""
    kind = F.lit("unknown")
    for name, magic in _MAGIC.items():
        prefix = F.expr(f"substring({content_col}, 1, {len(magic)})")
        kind = F.when(prefix == F.lit(bytearray(magic)), F.lit(name)).otherwise(kind)
    return df.withColumn("media_kind", kind)


_IMG_FEATURE_SCHEMA = (
    "path string, media_kind string, width int, height int, n_channels int, "
    "decoder string, feature array<float>"
)


def _decode_image_real(content: bytes) -> tuple[int, int, int, list[float]]:
    """Real decoder — requires PIL (not in this container).

    Raises NotImplementedError when PIL is missing; callers go through
    the registry below which falls back to the deterministic stub.
    """
    try:
        import io
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - PIL absent here
        raise NotImplementedError("image decode requires PIL") from e
    img = Image.open(io.BytesIO(content))  # pragma: no cover
    hist = img.histogram()[:16]  # pragma: no cover
    return img.width, img.height, len(img.getbands()), [float(x) for x in hist]  # pragma: no cover


def _decode_image_stub(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic FAKE decode (md5-derived): stands in for the real
    decoder so the distributed plumbing is testable in this container."""
    digest = hashlib.md5(content).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [round(b / 255.0, 6) for b in digest]
    return width, height, 3, feature


def decode_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary image columns
    (mapInPandas: one pandas batch per Arrow chunk — never per-row
    Python). Output schema is fixed regardless of which decoder ran."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                try:
                    w, h, c, feat = _decode_image_real(content)
                    decoder = "pil"
                except NotImplementedError:
                    w, h, c, feat = _decode_image_stub(content)
                    decoder = "stub"
                rows.append(
                    {
                        "path": r["path"],
                        "media_kind": r.get("media_kind", "unknown"),
                        "width": w,
                        "height": h,
                        "n_channels": c,
                        "decoder": decoder,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "path", "media_kind", "width", "height", "n_channels", "decoder", "feature",
            ])

    cols = ["path", "content"] + (["media_kind"] if "media_kind" in df.columns else [])
    return df.select(*cols).mapInPandas(decode_batches, _IMG_FEATURE_SCHEMA)


_RESIZE_SCHEMA = (
    "path string, width int, height int, out_w int, out_h int, "
    "resized_len long, checksum string"
)


def _resize_image_real(content: bytes, out_w: int, out_h: int) -> bytes:
    """Real resize — requires PIL (not in this container). Raises
    NotImplementedError when PIL is missing; callers fall back to the
    deterministic stub below."""
    try:
        import io
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - PIL absent here
        raise NotImplementedError("image resize requires PIL") from e
    img = Image.open(io.BytesIO(content)).resize((out_w, out_h))  # pragma: no cover
    buf = io.BytesIO()  # pragma: no cover
    img.save(buf, format="PNG")  # pragma: no cover
    return buf.getvalue()  # pragma: no cover


def _resize_image_stub(content: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic FAKE resize: out_w×out_h×3 bytes cycling the md5
    of (content ‖ '|{w}x{h}') — byte-reproducible from the input, so
    the full resize path (batch shape, payload size, checksum) is
    value-checkable without an image library."""
    digest = hashlib.md5(content + f"|{out_w}x{out_h}".encode()).digest()
    n = out_w * out_h * 3
    return (digest * (n // len(digest) + 1))[:n]


def resize_images(
    df: DataFrame, out_w: int = 32, out_h: int = 32, force_stub: bool = False
) -> DataFrame:
    """Arrow-batched resize over binary image columns (mapInPandas,
    same registry shape as decode: real PIL path, deterministic stub
    fallback). Emits original dimensions, target dimensions, the
    resized payload length and an md5 checksum of the resized bytes —
    metadata only, so the driver never ships pixel buffers unless the
    caller selects them.

    The real and stub paths are picked TOGETHER (dimensions + payload
    from the same decoder) so outputs are never a mix of real pixels
    and fake metadata. ``force_stub=True`` pins the deterministic stub
    regardless of installed libraries — used by the oracle-gated query,
    whose closed-form SQL replays the stub contract and would
    spuriously fail the moment PIL appeared in the environment."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if force_stub:
                    out = _resize_image_stub(content, out_w, out_h)
                    w, h, _, _ = _decode_image_stub(content)
                else:
                    try:
                        out = _resize_image_real(content, out_w, out_h)
                        w, h, _, _ = _decode_image_real(content)  # pragma: no cover
                    except NotImplementedError:
                        out = _resize_image_stub(content, out_w, out_h)
                        w, h, _, _ = _decode_image_stub(content)
                rows.append(
                    {
                        "path": r["path"],
                        "width": w,
                        "height": h,
                        "out_w": out_w,
                        "out_h": out_h,
                        "resized_len": len(out),
                        # checksum over the HEX encoding: engine-portable
                        # (SQL md5 implementations take strings, not blobs)
                        "checksum": hashlib.md5(out.hex().encode()).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "path", "width", "height", "out_w", "out_h", "resized_len", "checksum",
            ])

    return df.select("path", "content").mapInPandas(resize_batches, _RESIZE_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 1024, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like blobs: split the binary payload
    into fixed-size "frames" and keep every k-th — expressed as a JVM
    posexplode over substring slices (a real video sampler would swap
    the slicer for a codec call inside mapInPandas, same shape)."""
    n_frames = F.least(
        F.ceil(F.length("content") / frame_bytes).cast("int"), F.lit(max_frames)
    )
    # sequence(0, n-1) with n=0 would yield the *descending* [0, -1] —
    # guard empty payloads to an empty frame list instead.
    frames = F.when(n_frames <= 0, F.array().cast("array<binary>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
            lambda i: F.substr(F.col("content"), i * frame_bytes + 1, F.lit(frame_bytes)),
        )
    )
    return df.select(
        "path",
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    ).withColumn("frame_len", F.length("frame_bytes").cast("long"))


def _dhash_image_real(content: bytes) -> int:
    """Real dHash — requires PIL (not in this container): grayscale,
    resize to 9x8, set bit (r*8+c) when px[r][c] < px[r][c+1]. Raises
    NotImplementedError when PIL is missing; callers fall back to the
    deterministic stub below."""
    try:
        import io
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - PIL absent here
        raise NotImplementedError("dHash requires PIL") from e
    img = Image.open(io.BytesIO(content)).convert("L").resize((9, 8))  # pragma: no cover
    px = list(img.getdata())  # pragma: no cover
    return _dhash_from_pixels(px)  # pragma: no cover


def _dhash_from_pixels(px: list[int]) -> int:
    """9x8 row-major grayscale pixels -> signed 64-bit dHash (bit
    r*8+c set when the pixel is darker than its right neighbor)."""
    h = 0
    for r in range(8):
        for c in range(8):
            if px[r * 9 + c] < px[r * 9 + c + 1]:
                h |= 1 << (r * 8 + c)
    return h - (1 << 64) if h >= 1 << 63 else h


def _dhash_image_stub(content: bytes) -> int:
    """Deterministic FAKE dHash: the 9x8 grayscale plane is the md5 of
    (content ‖ '|dhash9x8') cycled to 72 bytes — byte-reproducible, so
    the full perceptual-hash path is closed-form SQL over md5(text)
    (pixel i is digest byte i % 16, i.e. a hex pair of the md5)."""
    digest = hashlib.md5(content + b"|dhash9x8").digest()
    return _dhash_from_pixels(list((digest * 5)[:72]))


def dhash_images(df: DataFrame, force_stub: bool = False) -> DataFrame:
    """Arrow-batched perceptual hash over binary image columns
    (mapInPandas — same registry shape as decode/resize: real PIL
    path, deterministic md5 stub fallback; ``force_stub=True`` pins
    the stub for the oracle-gated query). Emits (path, dhash64):
    map-only, no shuffle — pairing happens downstream via hamming
    band buckets (operators.hashing.hamming_band_pairs)."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if force_stub:
                    h = _dhash_image_stub(content)
                else:
                    try:
                        h = _dhash_image_real(content)  # pragma: no cover
                    except NotImplementedError:
                        h = _dhash_image_stub(content)
                rows.append({"path": r["path"], "dhash64": h})
            yield pd.DataFrame(rows, columns=["path", "dhash64"])

    return df.select("path", "content").mapInPandas(
        hash_batches, "path string, dhash64 long"
    )
