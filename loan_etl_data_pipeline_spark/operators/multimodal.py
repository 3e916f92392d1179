"""Multimodal (binary) columns (EXT E5 — SURVEY.md §2 Part B).

Design: media is an opaque ``binary`` column plus a typed metadata
struct, the layout ``spark.read.format("binaryFile")`` produces and the
one that scales — blobs stay columnar-compressed in parquet, metadata
prunes without touching bytes.

The heavy per-item work (decode, resize, feature-extract, frame-sample)
runs as Arrow-batched ``mapInPandas`` — the schema/partitioning/batch
plumbing here is real and tested; the actual image/audio decode is
STUBBED (``decode_stub``) because no media libraries exist in this
container. Swap ``_decode_payload`` for PIL/librosa/etc. in a real
deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata schema carried alongside every blob
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video | text
        StructField("payload", BinaryType()),
        StructField("byte_size", LongType()),
        StructField("sha256", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_size", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of ``text_col``).

    Stands in for reading real media; gives the binary-column plumbing a
    deterministic payload that any engine can reproduce.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def read_media_dir(
    spark,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of real media files via Spark's built-in
    ``binaryFile`` source, normalized to the engine's media contract
    (media_id, media_type, payload) — the ingestion half that
    ``attach_binary_payload`` stands in for when no files exist.

    media_id = the fully-qualified file path (stable, re-ingest-safe),
    media_type = lowercased filename extension. The binaryFile source
    streams file contents as one row per file with pushed path filters
    (``glob``, e.g. ``*.jpg``) — at 100 TB you shard by directory
    layout and the scan parallelizes per file; files larger than
    ``spark.sql.files.maxPartitionBytes`` still land in ONE row, so
    cap media size upstream or chunk at ingest.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    raw = r.load(path)
    # extension from the BASENAME only — a dot in a directory name or
    # URI authority (hdfs://nn.prod.example.com/...) must not leak into
    # the type of an extension-less file
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    segs = F.split(fname, r"\.")
    ext = F.lower(F.element_at(segs, -1))
    # extension-less forms beyond "no dot at all": a trailing-dot name
    # ("archive.") yields an empty last segment, and a bare dotfile
    # (".bashrc") has only its leading dot — both are payload of
    # unknown type, not files with extension "" / "bashrc".  (Today
    # Hadoop's hidden-file PathFilter drops leading-dot names before
    # they reach this column; the branch is kept so a source swap that
    # surfaces them stays correct.)
    extensionless = (
        ~fname.contains(".")
        | (ext == "")
        | ((F.size(segs) == 2) & (F.element_at(segs, 1) == ""))
    )
    families = {
        "image": ("jpg", "jpeg", "png", "gif", "bmp", "webp"),
        "audio": ("wav", "mp3", "flac", "ogg"),
        "video": ("mp4", "avi", "mkv", "mov", "webm"),
    }
    typed = None
    for fam, exts in families.items():
        branch = F.when(ext.isin(*exts), F.concat(F.lit(fam + "/"), ext))
        typed = branch if typed is None else typed.when(
            ext.isin(*exts), F.concat(F.lit(fam + "/"), ext)
        )
    media_type = F.when(extensionless, F.lit("bin")).otherwise(
        typed.otherwise(ext)  # known family → "image/jpg"-style
    )  # (the "family/ext" form is what decode_images dispatches on)
    return raw.select(
        F.col("path").alias("media_id"),
        media_type.alias("media_type"),
        F.col("content").alias("payload"),
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """byte_size + sha256 per blob via Arrow-batched mapInPandas.

    This is the template for every real extractor: iterate Arrow record
    batches, run a vectorized/bytes-level Python step, emit a typed
    frame. Partitioning is inherited from the input — repartition by a
    size-balanced key before calling this on skewed blob sizes.

    The output media_id inherits the INPUT's type: synthetic ids are
    bigint, binaryFile-ingested ids (read_media_dir) are path strings —
    pinning bigint here would make the real-file path a type crash.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_size": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    id_type = df.schema["media_id"].dataType
    schema = StructType(
        [StructField("media_id", id_type)] + [f for f in META_SCHEMA if f.name != "media_id"]
    )
    return df.mapInPandas(_batches, schema=schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def _container_frames(
    b: bytes, *, every_k: int, max_frames: int | None, frame_size: int
) -> list[tuple[int, bytes]]:
    """REAL frame extraction via PyAV: demux the first video stream,
    keep every ``k``-th decoded frame, rescale to frame_size² rgb24,
    return (frame_no, raw rgb24 bytes) pairs. Honest refusal when av
    is absent — never a silent fake (that's ``mode="bytes"``)."""
    av = _av_module()
    if av is None:
        raise NotImplementedError(
            "no container demuxer available: install av (PyAV) — this "
            "container ships none; use mode='bytes' for the plumbing-"
            "test byte-slicing path"
        )
    import io  # noqa: PLC0415

    out: list[tuple[int, bytes]] = []
    with av.open(io.BytesIO(b)) as container:
        stream = next((s for s in container.streams if s.type == "video"), None)
        if stream is None:
            return out
        kept = 0
        for i, frame in enumerate(container.decode(stream)):
            if i % every_k:
                continue
            img = frame.reformat(
                width=frame_size, height=frame_size, format="rgb24"
            )
            out.append((i, bytes(img.planes[0])))
            kept += 1
            if max_frames is not None and kept >= max_frames:
                break
    return out


def sample_frames(
    df: DataFrame,
    *,
    frame_size: int = 64,
    every_k: int = 4,
    max_frames: int | None = 16,
    mode: str = "bytes",
) -> DataFrame:
    """Frame sampling: one blob row in, one row per sampled frame out.

    ``mode="bytes"`` (default): treat the payload as fixed-size frames,
    keep every ``k``-th, cap at ``max_frames`` — the deterministic
    plumbing path that runs with no media libs. ``mode="container"``:
    REAL demux+decode via PyAV when importable on the executors
    (every ``k``-th decoded frame, rescaled to frame_size² rgb24),
    per-row NotImplementedError otherwise — mirroring
    :func:`decode_images`'s PIL stance. Either way the Spark plumbing
    is identical (blob row → many frame rows via mapInPandas, frame_no
    for downstream ordering/joins), and that is the part that matters
    at scale: frames explode 10-100× the row count, so sample INSIDE
    the scan kernel, never materialize all frames first.
    """
    if mode not in ("bytes", "container"):
        raise ValueError(f"mode must be 'bytes' or 'container', got {mode!r}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if mode == "container":
                    for fno, fb in _container_frames(
                        b,
                        every_k=every_k,
                        max_frames=max_frames,
                        frame_size=frame_size,
                    ):
                        ids.append(mid)
                        nos.append(fno)
                        frames.append(fb)
                    continue
                picked = range(0, max(len(b) // frame_size, 1), every_k)
                if max_frames is not None:
                    picked = list(picked)[:max_frames]
                for fno in picked:
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(b[fno * frame_size : (fno + 1) * frame_size])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(_batches, schema=FRAME_SCHEMA)


def _pil_image():
    """Optional decoder dependency: PIL when installed, else None.

    Import is attempted at call time (inside the executor kernel), not
    module load — the package must import cleanly on machines without
    media libs, and executors may have them when the driver doesn't.
    """
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _av_module():
    """Optional container demuxer: PyAV when installed, else None.

    Same call-time import stance as :func:`_pil_image` — the package
    must import cleanly on machines without media libs, and executors
    may have them when the driver doesn't.
    """
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _decode_payload(payload: bytes, media_type: str):
    """Real decode when a decoder lib is present; honest error when not.

    Images: PIL → ``(width, height, mode)``. Video: PyAV demux of the
    container's first video stream → ``(width, height, codec_name)``.
    Audio: PyAV → ``(channels, sample_rate, codec_name)`` — the same
    3-tuple shape so one schema serves all families. No deterministic
    fake here — the fake path lives in :func:`decode_stub` and is
    clearly labeled; this function is only ever the REAL thing or an
    explicit refusal.
    """
    if media_type.startswith("image"):
        Image = _pil_image()
        if Image is not None:
            import io  # noqa: PLC0415

            with Image.open(io.BytesIO(payload)) as im:
                return (im.width, im.height, im.mode)
    elif media_type.startswith(("video", "audio")):
        av = _av_module()
        if av is not None:
            import io  # noqa: PLC0415

            with av.open(io.BytesIO(payload)) as container:
                want = "video" if media_type.startswith("video") else "audio"
                stream = next(
                    (s for s in container.streams if s.type == want), None
                )
                if stream is None:
                    raise ValueError(
                        f"container has no {want} stream "
                        f"(media_type={media_type!r})"
                    )
                cc = stream.codec_context
                if want == "video":
                    return (cc.width, cc.height, cc.name)
                return (cc.channels, cc.sample_rate, cc.name)
    raise NotImplementedError(
        f"no decoder available for media_type={media_type!r}: install "
        "PIL (images) / av (video+audio) — this container ships "
        "neither"
    )


IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
    ]
)


def decode_images(df: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads — PIL-backed when PIL is
    importable on the executors, per-row NotImplementedError otherwise
    (surfaced as the task failure, not silently faked).

    Same Arrow-batched mapInPandas shape as :func:`decode_stub`; the
    output (media_id, width, height, mode) feeds resize/filter steps.
    Distinct from the stub on purpose: callers choose between
    "executable fake for plumbing tests" and "real decode or die".
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, ms = [], [], []
            mts = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else ["image"] * len(pdf)
            )
            for payload, mt in zip(pdf["payload"], mts):
                w, h, mode = _decode_payload(bytes(payload), mt or "image")
                ws.append(w)
                hs.append(h)
                ms.append(mode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "mode": ms,
                }
            )

    cols = ["media_id", "payload"] + (
        ["media_type"] if "media_type" in df.columns else []
    )
    return df.select(*cols).mapInPandas(_batches, schema=IMAGE_DECODE_SCHEMA)


def decode_stub(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode step: STUB (no media libs in this container).

    With ``fake=True`` emits a deterministic pseudo-decode (first 16
    payload bytes hex + byte length as 'dimensions') so the pipeline
    shape — mapInPandas batch in, typed struct out — is executable and
    testable end-to-end. With ``fake=False`` raises NotImplementedError
    through the same code path a real decoder would occupy.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("decoded_header", StringType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf.apply(
                    lambda r: _decode_payload(r["payload"], r.get("media_type", "")), axis=1
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_header": pdf["payload"].map(lambda b: bytes(b)[:16].hex()),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(_batches, schema=out_schema)


EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_media(df: DataFrame, *, dim: int = 64) -> DataFrame:
    """Embedding extraction kernel: blob row in, (media_id, vec) out.

    The bridge from the multimodal layer to the similarity layer: the
    output column is the same ``array<float>`` shape as the
    ``embeddings`` table, so it feeds ``cosine_topk_bruteforce`` /
    ``lsh_topk`` / ``ivf_topk`` (operators/similarity.py, operators/
    ivf.py) unchanged — dedup-by-embedding over raw media is this
    kernel plus ``cosine_neardup_lsh``. The embedder itself is a
    deterministic stand-in (sha256-expanded payload bytes → floats in
    [-1, 1]); a real deployment swaps in a model-inference call inside
    the SAME mapInPandas kernel — batch shape, schema, and partitioning
    (inherit, or repartition by size first) are the parts that matter
    at scale, and they are what this function pins down.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for payload in pdf["payload"]:
                raw = b""
                seed = hashlib.sha256(bytes(payload)).digest()
                counter = 0
                while len(raw) < 2 * dim:
                    raw += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
                    counter += 1
                vecs.append(
                    [
                        int.from_bytes(raw[2 * i : 2 * i + 2], "big", signed=True)
                        / 32768.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return df.select("media_id", "payload").mapInPandas(_batches, schema=EMBED_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis as a float64 numpy matrix (no scipy in
    the container; a matmul against a 32×32 basis IS the 2-D DCT)."""
    import numpy as np

    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    c = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    c[0, :] *= 1 / np.sqrt(2)
    return c * np.sqrt(2 / n)


def phash_media(
    df: DataFrame, *, img_size: int = 32, hash_size: int = 8
) -> DataFrame:
    """Perceptual hash (pHash) per media row: grayscale ``img_size``²
    pixels → 2-D DCT → the low-frequency ``hash_size``² block →
    1 bit per coefficient (above/below the block's non-DC median),
    packed into one int64 — near-identical images land within a few
    Hamming bits, so image near-dup is this kernel plus the SAME
    pigeonhole band join SimHash text dedup uses
    (operators/dedup.py fingerprint_near_duplicates).

    Pixels come from PIL when importable on the executors
    (convert('L').resize – real decode, the decode_images stance);
    otherwise the payload BYTES are interpreted directly as a
    grayscale raster (tiled/truncated to img_size²) — deterministic,
    and faithful enough that pHash's defining property is testable
    without the lib: the hash depends only on DCT *AC* coefficients,
    so a constant brightness shift must not change a single bit.

    Arrow mapInPandas kernel, one int64 out per row — the 100 TB shape
    is scan-speed hashing then a banded self-join on 8-byte keys.
    """
    import numpy as np

    if hash_size * hash_size > 64:
        raise ValueError(f"hash_size² must fit 64 bits, got {hash_size}")
    dct = _dct_matrix(img_size)

    def _pixels(pil, payload: bytes):
        if pil is not None and payload:
            import io

            try:
                img = pil.open(io.BytesIO(payload)).convert("L").resize(
                    (img_size, img_size)
                )
                return np.asarray(img, dtype=np.float64)
            except Exception:
                pass  # not a decodable image: fall through to raw bytes
        need = img_size * img_size
        if not payload:
            return np.zeros((img_size, img_size))  # empty blob: flat raster
        b = (payload * (need // len(payload) + 1))[:need]
        return np.frombuffer(b, dtype=np.uint8).astype(np.float64).reshape(
            img_size, img_size
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # PIL availability is decided ON THE EXECUTOR (same stance as
        # _decode_payload) — a driver-side probe would pickle the
        # module by reference and crash heterogeneous clusters. The
        # probe is INLINE (not a call to module-level _pil_image) so
        # cloudpickle ships this closure by value and workers need
        # neither this package nor PIL on their path.
        try:
            from PIL import Image as pil  # noqa: N813
        except Exception:
            pil = None
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                px = _pixels(pil, bytes(payload))
                coeffs = dct @ px @ dct.T
                block = coeffs[:hash_size, :hash_size].flatten()
                med = float(np.median(block[1:]))  # exclude DC
                bits = 0
                for i, v in enumerate(block):
                    if i > 0 and v > med:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64
                hashes.append(bits)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return df.select("media_id", "payload").mapInPandas(
        _batches, schema=PHASH_SCHEMA
    )
