"""Multimodal column operators (SURVEY §2.J J5) — image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / clearly-marked stubs (NotImplementedError) — but the
Spark-side plumbing is real and tested: schemas, binaryFile source,
mapInPandas batch shapes, partition sizing. Swapping a real decoder in
changes only the kernel body.

Scale notes: binary payloads ride in the same row as metadata; keep
``spark.sql.files.maxPartitionBytes`` at 128 MB so a partition of
multi-MB blobs still fits executor memory; feature extraction is
mapInPandas (Arrow zero-copy batches), never a row-at-a-time UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """J5 source: the binaryFile format gives (path, modificationTime,
    length, content BINARY) — the multimodal analog of the markdown scan."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(path)
    )
    return df.select(
        F.col("path").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.create_map(F.lit("length"), F.col("length").cast("string")).alias("meta"),
    )


def _fake_decode_image(content: bytes) -> tuple[int, int]:
    """STUB decode: a real kernel would use PIL/libvips here (absent in
    this container). Deterministic fake: dimensions derived from content
    hash so tests are stable."""
    import hashlib

    h = hashlib.md5(content or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def extract_image_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract as ONE mapInPandas pass (batch in, batch
    out — the production shape for a real CV model)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chatbot_spark.operators.embed import hash_embed_one

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                w, h = _fake_decode_image(content)
                sha = hashlib.sha256(content).hexdigest()
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(content),
                        "sha": sha,
                        "width": w,
                        "height": h,
                        "embedding": hash_embed_one(sha, dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


# ------------------------------------------------------------------ audio
# REAL kernel: RIFF/WAVE is parseable with the stdlib (`wave`) and PCM16
# decodes with one numpy frombuffer — no ffmpeg needed. Features are exact
# integers (sum of squares, peak, zero crossings) so an oracle can verify
# the whole parse→decode→extract path bit-for-bit. Compressed formats
# (mp3/ogg) would swap the decode body only.

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("bit_depth", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def sawtooth_pcm16(freq: int, rate: int, n: int):
    """Integer-exact sawtooth samples in [-16383, 16383]: pure integer
    arithmetic (no transcendentals), so any engine reproduces every sample
    — the determinism strategy the hash embedder uses, applied to audio."""
    import numpy as np

    t = np.arange(n, dtype=np.int64)
    return (((t * freq) % rate) * 32766 // rate - 16383).astype(np.int16)


def synth_wav_pcm16(samples, rate: int) -> bytes:
    """Write mono PCM16 samples as a real RIFF/WAVE byte string."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def extract_audio_features(df: DataFrame) -> DataFrame:
    """J5 audio: parse the RIFF/WAVE container, decode PCM16, and extract
    exact-integer features in ONE mapInPandas pass (the production shape
    for a real audio featurizer; a spectral model would extend the kernel
    body, not the plumbing)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                with wave.open(io.BytesIO(content), "rb") as w:
                    rate, channels = w.getframerate(), w.getnchannels()
                    width, n_frames = w.getsampwidth(), w.getnframes()
                    frames = w.readframes(n_frames)
                if width != 2:
                    raise ValueError(f"only PCM16 supported, got width={width}")
                s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                if channels > 1:  # mixdown: first channel (deterministic)
                    s = s[::channels]
                sign = s < 0
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "sample_rate": rate,
                        "channels": channels,
                        "bit_depth": 8 * width,
                        "n_frames": n_frames,
                        "duration_ms": n_frames * 1000 // rate,
                        "peak": int(np.abs(s).max()) if len(s) else 0,
                        "sum_sq": int((s * s).sum()),
                        "zero_crossings": int((sign[1:] != sign[:-1]).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# ------------------------------------------------------------------ video
# The container has no ffmpeg, so real codecs are out — but the brief's
# contract is real PLUMBING with the decode behind a deterministic stand-in.
# RAWV is a minimal uncompressed container (magic + dims + frame count +
# contiguous grayscale frames) whose parse/sample path is byte-identical in
# shape to an ffmpeg-backed kernel: header walk, per-frame offsets, stride
# sampling, one output row per sampled frame. Swapping in ffmpeg changes
# only `_decode`.

_RAWV_MAGIC = b"RAWV"

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("pix_sum", T.LongType(), True),
    ]
)


def synth_rawv(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic grayscale video: pixel(i, fr) = (7i + 13·fr + seed)
    % 256 — pure integer arithmetic, reproducible by any engine."""
    import struct

    import numpy as np

    header = _RAWV_MAGIC + struct.pack("<HHI", width, height, n_frames)
    i = np.arange(width * height, dtype=np.int64)
    frames = [
        ((7 * i + 13 * fr + seed) % 256).astype(np.uint8).tobytes()
        for fr in range(n_frames)
    ]
    return header + b"".join(frames)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """J5 video: parse the container header, seek frame offsets, decode
    every ``every_n``-th frame, one output row per sampled frame — ONE
    mapInPandas pass (batch of videos in, batch of frames out)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                if content[:4] != _RAWV_MAGIC:
                    raise ValueError("not a RAWV container")
                w, h, n = struct.unpack("<HHI", content[4:12])
                fsize = w * h
                for fr in range(0, n, every_n):
                    off = 12 + fr * fsize
                    frame = np.frombuffer(content[off : off + fsize], dtype=np.uint8)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": fr,
                            "width": w,
                            "height": h,
                            "n_frames": n,
                            "pix_sum": int(frame.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields])

    return df.mapInPandas(kernel, VIDEO_FRAMES_SCHEMA)


def synth_rawv_scenes(
    width: int, height: int, n_frames: int, seed: int, scene_len: int
) -> bytes:
    """Deterministic multi-scene grayscale video: pixel(i, fr) =
    (7i + 13·fr + seed + 128·(fr // scene_len)) % 256 — smooth +13 drift
    within a scene (mean |Δ| ≈ 25/pixel after mod-256 wrap), a 128 jump
    at every scene boundary (mean |Δ| ≈ 127/pixel — mod-256 arithmetic
    makes LARGE additive jumps wrap into small diffs, so 128 is the
    maximally-separated choice, ~5× the within-scene SAD). Pure integer
    arithmetic, so the oracle replays every pixel (and therefore every
    inter-frame SAD) exactly."""
    import struct

    import numpy as np

    header = _RAWV_MAGIC + struct.pack("<HHI", width, height, n_frames)
    i = np.arange(width * height, dtype=np.int64)
    frames = [
        ((7 * i + 13 * fr + seed + 128 * (fr // scene_len)) % 256)
        .astype(np.uint8)
        .tobytes()
        for fr in range(n_frames)
    ]
    return header + b"".join(frames)


SCENE_CUTS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), True),  # later frame of the pair
        T.StructField("sad", T.LongType(), True),  # sum of |pixel diffs|
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def detect_scene_cuts(df: DataFrame, threshold: int) -> DataFrame:
    """J5 video segmentation: shot/scene-cut detection by inter-frame SAD
    (sum of absolute pixel differences) — the classic clip-splitting step
    of a video training-data pipeline (cut the crawl into shots, then
    sample/caption per shot). One mapInPandas pass per batch of videos:
    parse the RAWV header, decode adjacent frame pairs, emit one row per
    frame whose SAD against its predecessor exceeds ``threshold``.
    Exact integer arithmetic end to end — the oracle replays every pixel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                if content[:4] != _RAWV_MAGIC:
                    raise ValueError("not a RAWV container")
                w, h, n = struct.unpack("<HHI", content[4:12])
                fsize = w * h
                prev = None
                for fr in range(n):
                    off = 12 + fr * fsize
                    frame = np.frombuffer(
                        content[off : off + fsize], dtype=np.uint8
                    ).astype(np.int64)
                    if prev is not None:
                        sad = int(np.abs(frame - prev).sum())
                        if sad > threshold:
                            rows.append(
                                {
                                    "media_id": r["media_id"],
                                    "frame_idx": fr,
                                    "sad": sad,
                                    "n_frames": n,
                                }
                            )
                    prev = frame
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_CUTS_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, SCENE_CUTS_SCHEMA)


AUDIO_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("seg_idx", T.LongType(), True),
        T.StructField("start_frame", T.LongType(), True),
        T.StructField("end_frame", T.LongType(), True),  # inclusive
        T.StructField("n_active_frames", T.LongType(), True),
        T.StructField("energy_sum", T.LongType(), True),
    ]
)


def energy_segments(
    df: DataFrame, frame_len: int = 400, threshold: int = 0
) -> DataFrame:
    """J5 audio segmentation: VAD-shaped energy gating — decode PCM16,
    cut into non-overlapping frames of ``frame_len`` samples, mark frames
    with Σs² > ``threshold`` active, and merge consecutive active frames
    into segments (the speech-clip extraction step of an audio pipeline).
    Exact integer energies; segment merging is the classic
    gaps-and-islands fold, done in numpy inside the kernel and replayed
    by the oracle as SQL islands."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                with wave.open(io.BytesIO(content), "rb") as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only PCM16 supported")
                    channels = w.getnchannels()
                    frames = w.readframes(w.getnframes())
                s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                if channels > 1:
                    s = s[::channels]
                n_full = len(s) // frame_len
                if n_full == 0:
                    continue
                e = (
                    (s[: n_full * frame_len] ** 2)
                    .reshape(n_full, frame_len)
                    .sum(axis=1)
                )
                active = np.where(e > threshold)[0]
                if len(active) == 0:
                    continue
                # islands: consecutive active frame indices share one id
                breaks = np.where(np.diff(active) > 1)[0]
                starts = np.concatenate([[0], breaks + 1])
                ends = np.concatenate([breaks, [len(active) - 1]])
                for si, (a, b) in enumerate(zip(starts, ends)):
                    fa, fb = int(active[a]), int(active[b])
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "seg_idx": si,
                            "start_frame": fa,
                            "end_frame": fb,
                            "n_active_frames": fb - fa + 1,
                            "energy_sum": int(e[fa : fb + 1].sum()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SEGMENTS_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, AUDIO_SEGMENTS_SCHEMA)


def av_frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """frame_sample with a REAL codec: decode mp4/mkv/webm containers via
    PyAV (ffmpeg bindings) instead of the RAWV stand-in — same output
    schema, same one-mapInPandas-pass shape, pix_sum over the grayscale
    plane of each sampled frame. PyAV is not in this container; the kernel
    raises NotImplementedError at first use when it is absent (the RAWV
    path stays the deterministic oracle surface either way)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        try:
            import av
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "PyAV not installed in this environment; use frame_sample "
                "(RAWV stand-in codec) for deterministic decoding"
            ) from e
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                with av.open(io.BytesIO(bytes(r["content"] or b""))) as container:
                    stream = container.streams.video[0]
                    n = stream.frames or 0
                    media_rows = []
                    decoded = 0
                    for idx, frame in enumerate(container.decode(stream)):
                        decoded = idx + 1
                        if idx % every_n:
                            continue
                        gray = frame.reformat(format="gray").to_ndarray()
                        media_rows.append(
                            {
                                "media_id": r["media_id"],
                                "frame_idx": idx,
                                "width": frame.width,
                                "height": frame.height,
                                "n_frames": n,
                                "pix_sum": int(gray.astype(np.int64).sum()),
                            }
                        )
                    if n == 0:
                        # containers that don't record a frame count
                        # (stream.frames == 0) would diverge from
                        # frame_sample's always-populated contract — fall
                        # back to the decoded count
                        for row in media_rows:
                            row["n_frames"] = decoded
                    rows.extend(media_rows)
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields])

    return df.mapInPandas(kernel, VIDEO_FRAMES_SCHEMA)


# ------------------------------------------------------------------ image
# perceptual-hash near-dup (aHash): the image-side member of the dedup
# family (J2 x J5). RAWP is the minimal raw-grayscale container (magic +
# dims + row-major uint8 pixels) — real byte-level parsing, stdlib-only,
# same strategy as RIFF/WAVE above: a real codec (JPEG via PIL) would
# swap synth/parse only, the hash/pair machinery is format-agnostic.

_RAWP_MAGIC = b"RAWP"

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bits", T.ArrayType(T.IntegerType()), True),
    ]
)


def pattern_pixels(doc_id: int, width: int, height: int, group: int):
    """Integer-exact synthetic grayscale: a group-keyed base pattern plus
    a sparse per-image perturbation — images in a group are near-dups
    (few aHash bits flip), across groups they diverge. Pure integer
    arithmetic (%, *, +, CASE) so any engine reproduces every pixel."""
    import numpy as np

    y, x = np.mgrid[0:height, 0:width]
    base = (x * (3 + group) + y * (5 + 2 * group) + 37 * group) % 251
    noise = np.where((x + y * width + doc_id) % 101 == 0, doc_id % 40, 0)
    return np.minimum(base + noise, 255).astype(np.uint8)


def synth_rawp(pixels) -> bytes:
    """Pack a 2-D uint8 array as RAWP bytes (magic + <HH dims + raster)."""
    import struct

    h, w = pixels.shape
    return _RAWP_MAGIC + struct.pack("<HH", w, h) + pixels.tobytes()


def extract_image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Parse RAWP and compute the average hash in ONE mapInPandas pass:
    the image divides into a grid×grid block mesh (dims must divide
    evenly), and bit_i = 1 iff grid²·block_sum_i > total_sum — the
    integer-exact form of 'block mean above global mean' (no division,
    so engines agree bit-for-bit). Emits the 64 bits as an INT array;
    everything downstream treats them as an opaque fingerprint."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                if content[:4] != _RAWP_MAGIC:
                    raise ValueError("not a RAWP image")
                w, h = struct.unpack("<HH", content[4:8])
                px = np.frombuffer(content[8:], dtype=np.uint8).reshape(h, w)
                if h % grid or w % grid:
                    raise ValueError(f"dims {w}x{h} not divisible by {grid}")
                bh, bw = h // grid, w // grid
                sums = (
                    px.astype(np.int64)
                    .reshape(grid, bh, grid, bw)
                    .sum(axis=(1, 3))
                )
                total = int(sums.sum())
                bits = (sums.reshape(-1) * grid * grid > total).astype(np.int32)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": int(w),
                        "height": int(h),
                        "bits": bits.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    return df.mapInPandas(kernel, AHASH_SCHEMA)


def ahash_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance — the same
    pigeonhole block-LSH as text SimHash (dedup.py::simhash_pairs): the
    64 bits split into ``max_hamming + 1`` blocks, so any pair within
    the threshold MUST agree on at least one whole block (candidate
    recall is complete, not probabilistic); candidates equi-join on
    (block_idx, block_value) and verify exact hamming via one zip_with
    fold. Never an all-pairs cross join."""
    n_blocks = max_hamming + 1
    blocked = hashes.select(
        F.col("media_id").alias("__id"),
        F.col("bits").alias("__bits"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), "
                f"b -> struct(b AS bi, "
                f"array_join(transform(slice(bits, b * size(bits) DIV {n_blocks} + 1, "
                f"(b + 1) * size(bits) DIV {n_blocks} - b * size(bits) DIV {n_blocks}), "
                f"x -> CAST(x AS STRING)), '') AS bv))"
            )
        ).alias("__blk"),
    ).select("__id", "__bits", F.col("__blk.bi").alias("__bi"), F.col("__blk.bv").alias("__bv"))
    cand = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.__bi") == F.col("b.__bi"))
            & (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__bits").alias("__ba"),
            F.col("b.__bits").alias("__bb"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.aggregate(
                F.zip_with("__ba", "__bb", lambda x, y: F.abs(x - y)),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
        )
    )
    return cand.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
