"""Multimodal column plumbing: opaque binary payloads + typed metadata.

BASELINE.json mandate: image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched pandas functions over mapInPandas.

Decode kernels: PNG/BMP/PPM/GIF/JPEG images and PCM WAV audio are
decoded for REAL (pure numpy + stdlib, functions/codecs.py +
functions/jpeg.py — including baseline JPEG per ITU-T T.81 and real
GIF LZW). Unknown formats and video (MP3, H.264) fall back to a
clearly-marked deterministic md5 feature so the distributed plumbing
still runs on any payload; wire ffmpeg there in a full deployment.

Scale notes: payloads stay opaque end-to-end (no driver collect);
feature extraction is a narrow map; partition by content-size bands
upstream so a few giant videos don't skew task runtimes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` (the driver
    fixtures ship no binary column): payload = UTF-8 bytes of ``text``,
    kind cycles image/audio/video by ``doc_id``, duration scales with
    document length. Gives the binary pipeline real driver testdata to
    run — and be oracle-checked — against."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes):
    """Decode a PNG/BMP/PPM/JPEG payload to a uint8 numpy array via the
    pure-numpy codecs (functions/codecs.py + functions/jpeg.py — real
    kernels, implemented from the public file-format specs, including
    baseline JPEG per ITU-T T.81). Video formats still require an
    external codec and raise UnsupportedMedia; wire ffmpeg there in a
    full deployment."""
    from hi_csa_db_spark.functions import codecs

    fmt = codecs.sniff(payload or b"")
    if fmt == "png":
        return codecs.decode_png(payload)
    if fmt == "bmp":
        return codecs.decode_bmp(payload)
    if fmt == "ppm":
        return codecs.decode_ppm(payload)
    if fmt == "jpeg":
        from hi_csa_db_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "gif":
        return codecs.decode_gif(payload)
    raise codecs.UnsupportedMedia(f"no in-container decoder for {fmt or 'unknown'}")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: md5-derived floats.

    The fallback when a payload is not one of the really-decodable
    formats — keeps the distributed plumbing (batch shapes, schema,
    shuffle behavior) fully exercised on any input, including the
    text-derived driver fixtures.
    """
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def _feature_of(payload: bytes, dim: int) -> list[float]:
    """Real decode where the payload is a supported format (PNG/BMP/
    PPM image stats, WAV audio stats), md5 fake elsewhere."""
    from hi_csa_db_spark.functions import codecs

    fmt = codecs.sniff(payload)
    try:
        if fmt in ("png", "bmp", "ppm", "jpeg", "gif"):
            return codecs.image_feature(decode_image(payload), dim)
        if fmt == "wav":
            samples, rate = codecs.decode_wav(payload)
            return codecs.audio_feature(samples, rate, dim)
    except (codecs.UnsupportedMedia, ValueError):
        pass
    return _fake_feature(payload, dim)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media -> (media_id, kind, n_bytes, content_hash, feature).

    Arrow-batched mapInPandas; payload bytes never leave the executor.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": [_feature_of(p, dim) for p in payloads],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


CODEC_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("br_r", IntegerType()),
        StructField("br_g", IntegerType()),
        StructField("br_b", IntegerType()),
    ]
)


def codec_roundtrip_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exercise the REAL image codec on the executors: build a 24-bit
    BMP per row (5x3 px — odd width, so the 4-byte row stride padding
    is live — with id-derived sentinel pixels at top-left and
    bottom-right), run encode_bmp -> decode_bmp, and emit the decoded
    corner pixels. Because the sentinels are pure functions of the id,
    a SQL oracle can predict every output value WITHOUT decoding —
    channel order (BGR<->RGB), bottom-up row flip, and stride handling
    are all value-checked end-to-end through the distributed plan.
    Arrow-batched mapInPandas; payload bytes live and die executor-side.
    """
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in CODEC_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                r, g, b = i % 256, (i * 7) % 256, (i * 13) % 256
                img = np.zeros((3, 5, 3), np.uint8)
                img[0, 0] = (r, g, b)
                img[2, 4] = (g, b, r)
                out = codecs.decode_bmp(codecs.encode_bmp(img))
                rows.append(
                    {
                        "media_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "tl_r": int(out[0, 0, 0]),
                        "tl_g": int(out[0, 0, 1]),
                        "tl_b": int(out[0, 0, 2]),
                        "br_r": int(out[2, 4, 0]),
                        "br_g": int(out[2, 4, 1]),
                        "br_b": int(out[2, 4, 2]),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, CODEC_STATS_SCHEMA)


def exact_media_dedup(media: DataFrame) -> DataFrame:
    """Exact payload dedup on the content hash (JVM-side md5 over the
    binary column — no Python involved)."""
    return (
        media.withColumn("content_hash", F.md5(F.col("payload")))
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


JPEG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("uniform", IntegerType()),
        StructField("out_r", IntegerType()),
        StructField("out_g", IntegerType()),
        StructField("out_b", IntegerType()),
    ]
)


def jpeg_roundtrip_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exercise the REAL baseline-JPEG codec (functions/jpeg.py, pure
    numpy, ITU-T T.81) on the executors: per row, a 16x16 solid-colour
    RGB image (colour derived from the id) is encoded at quality 75 and
    decoded back; the output reports the decoded pixel and whether the
    whole decoded frame is uniform. Because a solid block quantizes to
    a DC-only spectrum, the decoded pixel is predictable in CLOSED FORM
    (jpeg.dc_roundtrip_value) — so a SQL oracle value-checks the whole
    chain (RGB->YCbCr, DCT, quality-75 quantization, Huffman entropy
    coding, byte stuffing, IDCT, YCbCr->RGB) through the distributed
    plan. Arrow-batched mapInPandas; payloads never leave executors."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions.jpeg import decode_jpeg, encode_jpeg

        cols = [f.name for f in JPEG_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                r, g, b = i % 256, (i * 7) % 256, (i * 13) % 256
                img = np.full((16, 16, 3), (r, g, b), np.uint8)
                out = decode_jpeg(encode_jpeg(img, quality=75))
                uni = int(
                    (out.min(axis=(0, 1)) == out.max(axis=(0, 1))).all()
                )
                rows.append(
                    {
                        "media_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "uniform": uni,
                        "out_r": int(out[0, 0, 0]),
                        "out_g": int(out[0, 0, 1]),
                        "out_b": int(out[0, 0, 2]),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, JPEG_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand each video row into frame-sampling tasks (one row per
    timestamp to decode) — the shuffle-friendly prelude to a decode
    stage; the decode itself is the stubbed kernel above."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("rate", IntegerType()),
        StructField("dom_bin", IntegerType()),
        StructField("n_harmonics", IntegerType()),
    ]
)


def audio_spectral_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio DSP on the executors, value-checked end to end: per
    row, a pure sine placed EXACTLY on FFT bin k = 10 + id % 100
    (freq = k*rate/N, so the spectrum is a clean delta — no leakage
    ambiguity) is synthesized, 16-bit-PCM encoded to WAV
    (codecs.encode_wav), decoded back (codecs.decode_wav), and
    spectrum-analyzed with numpy's rfft. The dominant bin must equal k
    despite the quantization round trip, and the half-amplitude
    threshold count of significant bins must be 1 — both predictable
    from the id alone, so a SQL oracle checks the synthesis + WAV
    round trip + FFT chain through the distributed plan (the audio
    twin of mm5/mm6's image-codec proofs). Arrow-batched mapInPandas;
    payloads never leave executors."""
    import numpy as np

    N, RATE = 2048, 8000

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in SPECTRAL_SCHEMA.fields]
        n = np.arange(N)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                k = 10 + i % 100
                sig = 0.8 * np.sin(2.0 * np.pi * k * n / N)
                samples, rate = codecs.decode_wav(
                    codecs.encode_wav(sig, rate=RATE)
                )
                mono = samples.mean(axis=1)
                mag = np.abs(np.fft.rfft(mono))
                mag[0] = 0.0  # ignore DC
                dom = int(np.argmax(mag))
                harm = int(np.sum(mag >= mag[dom] / 2.0))
                rows.append(
                    {
                        "media_id": i,
                        "n_samples": int(len(mono)),
                        "rate": int(rate),
                        "dom_bin": dom,
                        "n_harmonics": harm,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, SPECTRAL_SCHEMA)


GIF_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("br_r", IntegerType()),
        StructField("br_g", IntegerType()),
        StructField("br_b", IntegerType()),
    ]
)


def gif_roundtrip_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL GIF/LZW codec, value-checked: per row, a 2-colour 10x7
    checkerboard with id-derived palette entries is encoded (GIF89a,
    INTERLACED, real LZW compression) and decoded back on the
    executors. GIF is lossless, so the decoded corner pixels must
    equal the palette colours exactly — checkerboard parity makes
    top-left palette[0] and bottom-right palette[(9+6)%2=1], so the
    oracle predicts every output from the id alone, proving LZW
    coding both directions, sub-block framing, AND the four-pass
    interlace reorder through the distributed plan."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in GIF_STATS_SCHEMA.fields]
        yy, xx = np.mgrid[0:7, 0:10]
        board = ((yy + xx) % 2).astype(np.uint8)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                pal = np.array(
                    [
                        (i % 256, (i * 7) % 256, (i * 13) % 256),
                        ((i * 3) % 256, (i * 5) % 256, (i * 11) % 256),
                    ],
                    np.uint8,
                )
                out = codecs.decode_gif(
                    codecs.encode_gif(board, pal, interlace=True)
                )
                rows.append(
                    {
                        "media_id": i,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "tl_r": int(out[0, 0, 0]),
                        "tl_g": int(out[0, 0, 1]),
                        "tl_b": int(out[0, 0, 2]),
                        "br_r": int(out[6, 9, 0]),
                        "br_g": int(out[6, 9, 1]),
                        "br_b": int(out[6, 9, 2]),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, GIF_STATS_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_dhash(
    docs: DataFrame, id_col: str = "doc_id", classes: int = 50
) -> DataFrame:
    """Per-row difference hash (dHash) computed through the REAL image
    codec: an 8x8 grayscale gradient image — pixel v(x,y) =
    (k*31 + x*7 + y*13) % 256 with k = id % ``classes``, so exactly
    ``classes`` distinct images exist and same-k documents are true
    perceptual duplicates — is encoded to a 24-bit BMP and decoded
    back ON THE EXECUTORS (functions/codecs.py), then hashed by the
    standard horizontal-gradient rule bit[y*7+x] = [px(x+1,y) >
    px(x,y)] (56 bits, stays in positive BIGINT range).

    Because the pixels are pure functions of the id, a SQL oracle
    predicts every hash WITHOUT decoding — the decode path, channel
    layout, and gradient comparisons are value-checked through the
    distributed plan. Arrow-batched mapInPandas; image bytes never
    leave the executors (the 100 TB posture for media payloads)."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                k = i % classes
                xs = np.arange(8)[None, :]
                ys = np.arange(8)[:, None]
                v = ((k * 31 + xs * 7 + ys * 13) % 256).astype(np.uint8)
                img = np.repeat(v[:, :, None], 3, axis=2)
                out = codecs.decode_bmp(codecs.encode_bmp(img))
                gray = out[:, :, 0].astype(np.int64)
                h = 0
                for y in range(8):
                    for x in range(7):
                        if gray[y, x + 1] > gray[y, x]:
                            h += 1 << (y * 7 + x)
                rows.append({"doc_id": i, "phash": h})
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return docs.select(id_col).mapInPandas(gen, DHASH_SCHEMA)


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("container_bytes", LongType()),
        StructField("sampled_frames", IntegerType()),
        StructField("sampled_bytes", LongType()),
        StructField("parse_ok", IntegerType()),
    ]
)


def video_frame_stats(
    docs: DataFrame, id_col: str = "doc_id", every: int = 2
) -> DataFrame:
    """REAL video-container parsing + frame sampling, value-checked:
    per row, an id-derived stream (n = 3 + id%5 frames, frame i
    payload length 10 + (id + 7i) % 50 at pts = 40i) is packed into a
    real IVF container (codecs.encode_ivf — the DKIF layout VP8/VP9/
    AV1 elementary streams ship in), parsed back (codecs.parse_ivf:
    magic/header/frame-bounds validation), and every ``every``-th
    frame is selected — the frame-sampling primitive of a video
    training pipeline, with the container round trip proven through
    the distributed plan by a closed-form SQL oracle (the mm5-mm8
    codec-proof idiom; frame-pixel DECODE of real video codecs is out
    of scope — that kernel stays behind decode_image's media-type
    dispatch). parse_ok asserts fourcc/dims/pts/payload equality
    through the round trip. Arrow-batched mapInPandas; payloads never
    leave executors."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in VIDEO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                n = 3 + i % 5
                frames = [
                    (
                        40 * fi,
                        bytes(
                            (i * 31 + fi * 7 + j) % 256
                            for j in range(10 + (i + 7 * fi) % 50)
                        ),
                    )
                    for fi in range(n)
                ]
                w, h = 16 + i % 8, 9
                payload = codecs.encode_ivf(frames, w, h)
                parsed = codecs.parse_ivf(payload)
                ok = int(
                    parsed["fourcc"] == b"AV01"
                    and parsed["width"] == w
                    and parsed["height"] == h
                    and parsed["frames"] == frames
                )
                sampled = parsed["frames"][::every]
                rows.append(
                    {
                        "media_id": i,
                        "n_frames": len(parsed["frames"]),
                        "payload_bytes": sum(len(p) for _, p in parsed["frames"]),
                        "container_bytes": len(payload),
                        "sampled_frames": len(sampled),
                        "sampled_bytes": sum(len(p) for _, p in sampled),
                        "parse_ok": ok,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, VIDEO_STATS_SCHEMA)


KEYFRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_keyframes", IntegerType()),
        StructField("keyframe_bits", LongType()),
        StructField("total_bytes", LongType()),
    ]
)


def video_keyframes(
    docs: DataFrame, id_col: str = "doc_id", threshold: int = 500
) -> DataFrame:
    """Scene-change (keyframe) detection over REAL container payloads:
    the mm10 id-derived stream is packed into a real IVF/DKIF
    container, parsed back, and each frame is summarized by its exact
    integer byte sum; frame 0 and every frame whose byte-sum jump from
    its predecessor exceeds ``threshold`` is a keyframe — the
    shot-boundary primitive a video pipeline runs before sampling
    (mm10 samples blindly every k-th; this samples where content
    changes). The byte sums of the synthetic payloads have a closed
    form (an arithmetic series mod 256, wrapping at most once), so the
    SQL oracle predicts the keyframe set from the id alone — container
    round trip AND the diff rule are value-checked distributedly.

    Arrow-batched mapInPandas; payloads never leave executors."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in KEYFRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                n = 3 + i % 5
                frames = [
                    (
                        40 * fi,
                        bytes(
                            (i * 31 + fi * 7 + j) % 256
                            for j in range(10 + (i + 7 * fi) % 50)
                        ),
                    )
                    for fi in range(n)
                ]
                payload = codecs.encode_ivf(frames, 16 + i % 8, 9)
                parsed = codecs.parse_ivf(payload)
                sums = [sum(p) for _, p in parsed["frames"]]
                bits, nk = 0, 0
                for fi, s in enumerate(sums):
                    if fi == 0 or abs(s - sums[fi - 1]) > threshold:
                        bits |= 1 << fi
                        nk += 1
                rows.append(
                    {
                        "media_id": i,
                        "n_frames": len(sums),
                        "n_keyframes": nk,
                        "keyframe_bits": bits,
                        "total_bytes": sum(
                            len(p) for _, p in parsed["frames"]
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, KEYFRAME_SCHEMA)


TEMPO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_beats", IntegerType()),
        StructField("period_frames", IntegerType()),
        StructField("bpm_milli", LongType()),
    ]
)


def audio_tempo(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Beat-period (tempo) detection through the REAL WAV codec: a
    4096-sample click track with id-derived period P = 512·(1+id%4)
    samples (each click one 128-sample tone burst, beats aligned to
    the frame grid) is PCM-encoded/decoded, framed at 128 samples,
    reduced to a binary energy envelope, and the period recovered as
    the smallest candidate lag maximizing the envelope
    autocorrelation Σ e_f·e_{f+L} — the onset-autocorrelation tempo
    estimator in its integer-exact form. Because a true period p
    scores nb−L/p at its multiples, the smallest argmax IS p, so the
    oracle predicts every output from the id alone (the mm7/mm13
    proof pattern: synthesis, codec round trip, framing, envelope,
    and the estimator all value-checked distributedly)."""
    import numpy as np

    N, RATE, FRAME = 4096, 8000, 128
    THRESH = FRAME * 327 * 327

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in TEMPO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                P = 512 * (1 + i % 4)
                sig = np.zeros(N)
                t = np.arange(FRAME)
                burst = 0.9 * np.sin(2.0 * np.pi * 400.0 * t / RATE)
                for start in range(0, N, P):
                    sig[start : start + FRAME] = burst[: N - start][:FRAME]
                samples, _rate = codecs.decode_wav(
                    codecs.encode_wav(sig, rate=RATE)
                )
                ints = np.rint(samples[:, 0] * 32768.0).astype(np.int64)
                frames = ints.reshape(-1, FRAME)
                energy = (frames * frames).sum(axis=1)
                env = (energy > THRESH).astype(np.int64)
                nf = len(env)
                best_lag, best_score = 0, -1
                for lag in (4, 8, 12, 16):
                    score = int((env[: nf - lag] * env[lag:]).sum())
                    if score > best_score:
                        best_score, best_lag = score, lag
                rows.append(
                    {
                        "media_id": i,
                        "n_frames": nf,
                        "n_beats": int(env.sum()),
                        "period_frames": best_lag,
                        "bpm_milli": 60 * RATE * 1000
                        // (FRAME * best_lag),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, TEMPO_SCHEMA)


PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("patch_row", IntegerType()),
        StructField("patch_col", IntegerType()),
        StructField("patch_index", IntegerType()),
        StructField("mean_milli", LongType()),
    ]
)


def image_patches(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """ViT-style patch extraction through the REAL image codec: per
    row a 16x16 image with pixel (y,x) = (id + 3y + 7x) % 256 is
    BMP-encoded and decoded back on the executors (codecs.encode_bmp /
    decode_bmp — stride, BGR order, and row flip all live), then cut
    into the 4x4 grid of 4x4-px patches and flattened to one row per
    patch with its SEQUENCE POSITION (patch_index = row*4 + col) and
    integer-milli mean intensity — the image-to-patch-sequence
    transform a vision-transformer data pipeline runs, with the codec
    round trip proven because every mean is predictable from the id
    in closed form (the mm5 idiom at patch granularity).

    Arrow-batched mapInPandas; pixels never leave executors; the
    patch fan-out (16 rows/image) happens inside the UDF batch, so no
    shuffle carries pixel data."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in PATCH_SCHEMA.fields]
        yy, xx = np.mgrid[0:16, 0:16]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                plane = ((i + 3 * yy + 7 * xx) % 256).astype(np.uint8)
                img = np.stack([plane, plane, plane], axis=2)
                out = codecs.decode_bmp(codecs.encode_bmp(img))
                for pr in range(4):
                    for pc in range(4):
                        patch = out[pr * 4 : pr * 4 + 4, pc * 4 : pc * 4 + 4, 0]
                        s = int(patch.astype(np.int64).sum())
                        rows.append(
                            {
                                "media_id": i,
                                "patch_row": pr,
                                "patch_col": pc,
                                "patch_index": pr * 4 + pc,
                                "mean_milli": (s * 1000) // 16,
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, PATCH_SCHEMA)


AUGMENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("whole_mean_milli", LongType()),
        StructField("crop_mean_milli", LongType()),
        StructField("flip_edge_mean_milli", LongType()),
    ]
)


def image_augmentations(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Augmentation kernels through the REAL image codec: the 16x16
    id-derived image is BMP-encoded and decoded back (mm5/mm11
    contract), then HORIZONTALLY FLIPPED and CENTER-CROPPED on the
    decoded array — the two bread-and-butter vision augmentations —
    and each variant is summarized by an integer-milli mean the
    oracle predicts in closed form from the pixel formula (whole
    image; the 8x8 center crop; column 0 of the flipped image, which
    must equal column 15 of the original — the value proof that the
    flip actually reindexed pixels).

    Arrow-batched mapInPandas; flip/crop run on executor-local numpy
    arrays, only (id, three bigints) ever shuffle."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in AUGMENT_SCHEMA.fields]
        yy, xx = np.mgrid[0:16, 0:16]
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                plane = ((i + 3 * yy + 7 * xx) % 256).astype(np.uint8)
                img = np.stack([plane, plane, plane], axis=2)
                out = codecs.decode_bmp(codecs.encode_bmp(img))[:, :, 0]
                flipped = out[:, ::-1]
                crop = out[4:12, 4:12]
                rows.append(
                    {
                        "media_id": i,
                        "whole_mean_milli": (int(out.astype(np.int64).sum()) * 1000)
                        // 256,
                        "crop_mean_milli": (int(crop.astype(np.int64).sum()) * 1000)
                        // 64,
                        "flip_edge_mean_milli": (
                            int(flipped[:, 0].astype(np.int64).sum()) * 1000
                        )
                        // 16,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, AUGMENT_SCHEMA)


VAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("silent_frames", IntegerType()),
        StructField("active_frames", IntegerType()),
        StructField("first_active_frame", IntegerType()),
        StructField("speech_ratio_micro", LongType()),
    ]
)


def audio_vad(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Energy-based voice-activity detection through the REAL WAV
    codec (mm7's audio twin of the mm5/mm6 image-codec proofs): per
    row, a 2048-sample 8 kHz signal with an id-derived number of
    LEADING SILENT frames (1 + id % 4 frames of exact zeros, then a
    bin-aligned sine) is 16-bit-PCM encoded (codecs.encode_wav),
    decoded back, framed at 256 samples, and each frame's INTEGER
    energy (sum of squared int16 values — exact, because float32
    represents every int16/32768 exactly) is compared against the 1 %
    full-scale threshold 256·327². Zero frames survive the PCM round
    trip as exact zeros and tone frames carry ~8.8e10 energy, so the
    detected silent-prefix length must equal the synthesized one —
    the oracle predicts every output from the id alone, value-checking
    the synthesis, WAV round trip, framing, and energy gate through
    the distributed plan.

    Arrow-batched mapInPandas; audio payloads never leave executors."""
    import numpy as np

    N, RATE, FRAME = 2048, 8000, 256
    THRESH = FRAME * 327 * 327  # 1% full-scale RMS gate

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in VAD_SCHEMA.fields]
        n = np.arange(N)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                k = 10 + i % 100
                start = FRAME * (1 + i % 4)
                sig = 0.8 * np.sin(2.0 * np.pi * k * n / N)
                sig[:start] = 0.0
                samples, rate = codecs.decode_wav(
                    codecs.encode_wav(sig, rate=RATE)
                )
                ints = np.rint(samples[:, 0] * 32768.0).astype(np.int64)
                frames = ints.reshape(-1, FRAME)
                energy = (frames * frames).sum(axis=1)
                active = energy > THRESH
                n_frames = int(len(energy))
                n_active = int(active.sum())
                first = int(np.argmax(active)) if n_active else -1
                rows.append(
                    {
                        "media_id": i,
                        "n_frames": n_frames,
                        "silent_frames": n_frames - n_active,
                        "active_frames": n_active,
                        "first_active_frame": first,
                        "speech_ratio_micro": n_active * 1000000 // n_frames,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, VAD_SCHEMA)


TRIM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples_before", IntegerType()),
        StructField("n_samples_after", IntegerType()),
        StructField("bytes_before", LongType()),
        StructField("bytes_after", LongType()),
        StructField("saved_micro", LongType()),
    ]
)


def audio_silence_trim(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Silence TRIMMING — the action to audio_vad's detection: the
    same id-derived signal (leading silent prefix of 1 + id % 4
    256-sample frames, then a bin-aligned tone) is WAV-encoded,
    decoded, energy-gated per frame, CUT at the first active frame,
    and the trimmed audio is RE-ENCODED through the codec; the audit
    row carries the before/after sample and byte counts (44-byte
    header + 2 bytes/sample) and exact-integer savings. Every value
    is predictable from the id alone, so the oracle value-checks the
    full encode -> decode -> gate -> trim -> re-encode chain — real
    output bytes, not just detection flags — through the distributed
    plan. The storage-savings step an audio pipeline runs before
    archiving voice data.

    Arrow-batched mapInPandas; audio payloads never leave executors."""
    import numpy as np

    N, RATE, FRAME = 2048, 8000, 256
    THRESH = FRAME * 327 * 327

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in TRIM_SCHEMA.fields]
        n = np.arange(N)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                k = 10 + i % 100
                start = FRAME * (1 + i % 4)
                sig = 0.8 * np.sin(2.0 * np.pi * k * n / N)
                sig[:start] = 0.0
                wav = codecs.encode_wav(sig, rate=RATE)
                samples, rate = codecs.decode_wav(wav)
                ints = np.rint(samples[:, 0] * 32768.0).astype(np.int64)
                frames = ints.reshape(-1, FRAME)
                energy = (frames * frames).sum(axis=1)
                active = energy > THRESH
                first = int(np.argmax(active)) if active.any() else len(energy)
                trimmed = samples[first * FRAME :, 0]
                out = codecs.encode_wav(trimmed, rate=rate)
                rows.append(
                    {
                        "media_id": i,
                        "n_samples_before": int(len(ints)),
                        "n_samples_after": int(len(trimmed)),
                        "bytes_before": len(wav),
                        "bytes_after": len(out),
                        "saved_micro": (len(wav) - len(out))
                        * 1000000
                        // len(wav),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, TRIM_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("resized_mean_milli", LongType()),
        StructField("resized_checksum", LongType()),
        StructField("corner_cell", LongType()),
    ]
)


def image_resize(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """2x2 box-filter downsample (16x16 -> 8x8) through the REAL BMP
    codec — the RESIZE member of the decode/feature/resize/sample
    surface (mm12 covers flip/crop; this is the thumbnail path every
    vision-data pipeline runs before feature extraction). The decoded
    plane is reshaped to (8, 2, 8, 2) blocks and each block's INTEGER
    floor-mean becomes one output pixel — exact arithmetic, so the
    oracle predicts every cell from the pixel formula alone. Three
    value proofs per image: the integer-milli mean of the resized
    plane, a POSITION-WEIGHTED checksum (cell * (position+1) — a
    transposed or shifted resize cannot fake it), and the exact [0,0]
    cell.

    Arrow-batched mapInPandas; pixels stay executor-local, only
    (id, three bigints) shuffle."""
    import numpy as np

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hi_csa_db_spark.functions import codecs

        cols = [f.name for f in RESIZE_SCHEMA.fields]
        yy, xx = np.mgrid[0:16, 0:16]
        w = np.arange(1, 65, dtype=np.int64)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                plane = ((i + 3 * yy + 7 * xx) % 256).astype(np.uint8)
                img = np.stack([plane, plane, plane], axis=2)
                out = codecs.decode_bmp(codecs.encode_bmp(img))[:, :, 0]
                blocks = out.astype(np.int64).reshape(8, 2, 8, 2)
                small = blocks.sum(axis=(1, 3)) // 4
                flat = small.reshape(64)
                rows.append(
                    {
                        "media_id": i,
                        "resized_mean_milli": (int(flat.sum()) * 1000) // 64,
                        "resized_checksum": int((flat * w).sum()),
                        "corner_cell": int(small[0, 0]),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col).mapInPandas(gen, RESIZE_SCHEMA)
