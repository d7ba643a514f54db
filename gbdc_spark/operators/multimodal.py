"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
iteration — is real and tested.  The codec layer is NOT: this container
has no image/audio libraries, so payloads use a deterministic FAKE wire
format (little-endian header + raw samples, see ``synth_media_df``) and
``_decode_*`` functions parse that format with numpy.  Real-format decode
(JPEG/PNG/WAV/...) is gated behind an import-try of PIL/soundfile and
raises ``NotImplementedError`` when absent — swap `_decode_*` for the
real codecs on a cluster that ships them; every stage signature stays
identical.

Scale notes: payloads never leave the executor (features do); stages are
``mapInPandas`` so one media blob never splits across workers; pair with
``partitioning.size_bucketed(df, "n_bytes")`` for straggler control on
mixed-size corpora.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media_df",
    "docs_as_media",
    "image_features",
    "resize_images",
    "audio_features",
    "video_frame_sample",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_MAGIC = b"GBDM"  # fake wire format marker


def _pack_image(rng: np.random.Generator) -> tuple[bytes, dict]:
    w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
    pixels = rng.integers(0, 256, size=w * h, dtype=np.uint8)
    hdr = np.asarray([w, h, 0, 0], dtype="<i4").tobytes()
    return _MAGIC + hdr + pixels.tobytes(), {"width": w, "height": h,
                                             "sample_rate": None, "n_frames": None}


def _pack_audio(rng: np.random.Generator) -> tuple[bytes, dict]:
    sr = int(rng.choice([8000, 16000]))
    n = int(rng.integers(64, 513))
    pcm = rng.integers(-(2**14), 2**14, size=n, dtype=np.int16)
    hdr = np.asarray([0, 0, sr, n], dtype="<i4").tobytes()
    return _MAGIC + hdr + pcm.tobytes(), {"width": None, "height": None,
                                          "sample_rate": sr, "n_frames": None}


def _pack_video(rng: np.random.Generator) -> tuple[bytes, dict]:
    w, h = int(rng.integers(8, 17)), int(rng.integers(8, 17))
    n_frames = int(rng.integers(4, 33))
    frames = rng.integers(0, 256, size=n_frames * w * h, dtype=np.uint8)
    hdr = np.asarray([w, h, 0, n_frames], dtype="<i4").tobytes()
    return _MAGIC + hdr + frames.tobytes(), {"width": w, "height": h,
                                             "sample_rate": None, "n_frames": n_frames}


def synth_media_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table, generated DISTRIBUTED (each row a
    pure function of (seed, idx) — identical at any parallelism)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        packers = [("image", _pack_image), ("audio", _pack_audio), ("video", _pack_video)]
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + idx))
                mtype, packer = packers[idx % 3]
                payload, meta = packer(rng)
                rows.append(
                    {
                        "media_id": f"m{idx:08d}",
                        "media_type": mtype,
                        "payload": payload,
                        "n_bytes": len(payload),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def docs_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents TEXT BYTES —
    unlike ``synth_media_df`` (RNG payloads), every decoded feature is a
    pure arithmetic function of the text, so the driver's DuckDB oracle
    can verify the full pack→decode→feature path end to end.

    Per doc: one image (16 x ceil(n/16) grid of ASCII codes, zero-padded),
    one audio clip (8 kHz, samples = code-100 as int16), one video
    (4x4-pixel frames over consecutive 16-char blocks, remainder dropped).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
                h = -(-b.size // 16)
                px = np.zeros(16 * h, np.uint8)
                px[: b.size] = b
                rows.append({
                    "media_id": f"img{did:08d}", "media_type": "image",
                    "payload": _MAGIC + np.asarray([16, h, 0, 0], "<i4").tobytes()
                    + px.tobytes(),
                    "n_bytes": 20 + px.size,
                    "meta": {"width": 16, "height": h,
                             "sample_rate": None, "n_frames": None},
                })
                pcm = b.astype(np.int16) - 100
                rows.append({
                    "media_id": f"aud{did:08d}", "media_type": "audio",
                    "payload": _MAGIC
                    + np.asarray([0, 0, 8000, b.size], "<i4").tobytes()
                    + pcm.tobytes(),
                    "n_bytes": 20 + 2 * b.size,
                    "meta": {"width": None, "height": None,
                             "sample_rate": 8000, "n_frames": None},
                })
                nf = b.size // 16
                if nf:
                    rows.append({
                        "media_id": f"vid{did:08d}", "media_type": "video",
                        "payload": _MAGIC
                        + np.asarray([4, 4, 0, nf], "<i4").tobytes()
                        + b[: nf * 16].tobytes(),
                        "n_bytes": 20 + nf * 16,
                        "meta": {"width": 4, "height": 4,
                                 "sample_rate": None, "n_frames": nf},
                    })
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _split_payload(payload: bytes) -> tuple[np.ndarray, bytes]:
    """Sniff the wire format by magic bytes and normalize to the
    (header [w, h, sample_rate, n_frames], body) contract every stage
    consumes:

    * ``GBDM`` — the synthetic container (header verbatim);
    * ``\\x89PNG`` — real 8-bit grayscale PNG via the stdlib codec
      (operators/codecs.py: zlib inflate + full filter set);
    * ``RIFF`` — real mono PCM-16 WAV via the stdlib ``wave`` reader;
    * anything else (JPEG, MP3, MP4, ...) still needs a third-party
      codec and raises ``NotImplementedError`` honestly.
    """
    from . import codecs

    if payload[:8] == codecs.PNG_MAGIC:
        px = codecs.png_decode(payload)
        hdr = np.asarray([px.shape[1], px.shape[0], 0, 0], dtype="<i4")
        return hdr, px.tobytes()
    if payload[:4] == codecs.WAV_MAGIC:
        pcm, sr = codecs.wav_decode(payload)
        hdr = np.asarray([0, 0, sr, pcm.size], dtype="<i4")
        return hdr, pcm.tobytes()
    if payload[:4] != _MAGIC:
        try:  # heavier real codecs (JPEG etc.) — absent in this container
            import PIL  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "payload is neither GBDM, grayscale PNG, nor PCM-16 WAV; "
                "other formats need third-party codecs unavailable here"
            ) from None
        raise NotImplementedError("real-codec decode not wired up")
    hdr = np.frombuffer(payload[4:20], dtype="<i4")
    return hdr, payload[20:]


# ------------------------------------------------------------------ image
_IMG_FEAT_SCHEMA = (
    "media_id string, width int, height int, mean_pixel double, std_pixel double"
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode + per-image pixel statistics (one Arrow crossing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr, body = _split_payload(bytes(payload))
                w, h = int(hdr[0]), int(hdr[1])
                px = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                rows.append(
                    {
                        "media_id": mid, "width": w, "height": h,
                        "mean_pixel": float(px.mean()) if px.size else 0.0,
                        "std_pixel": float(px.std()) if px.size else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "image").mapInPandas(run, schema=_IMG_FEAT_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize on the decoded grid; re-packs the payload
    so downstream stages see the same wire format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr, body = _split_payload(bytes(payload))
                w, h = int(hdr[0]), int(hdr[1])
                px = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = px[np.ix_(yi, xi)]
                new_hdr = np.asarray([out_w, out_h, 0, 0], dtype="<i4").tobytes()
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": "image",
                        "payload": _MAGIC + new_hdr + small.tobytes(),
                        "n_bytes": 20 + out_w * out_h,
                        "meta": {"width": out_w, "height": out_h,
                                 "sample_rate": None, "n_frames": None},
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "image").mapInPandas(run, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------------ audio
_AUDIO_FEAT_SCHEMA = (
    "media_id string, sample_rate int, duration_s double, rms double, zero_crossings int"
)


def audio_features(df: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr, body = _split_payload(bytes(payload))
                sr, n = int(hdr[2]), int(hdr[3])
                pcm = np.frombuffer(body, dtype=np.int16).astype(np.float64)
                rows.append(
                    {
                        "media_id": mid, "sample_rate": sr,
                        "duration_s": n / sr if sr else 0.0,
                        "rms": float(np.sqrt(np.mean(pcm**2))) if pcm.size else 0.0,
                        "zero_crossings": int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))),
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "audio").mapInPandas(run, schema=_AUDIO_FEAT_SCHEMA)


# ------------------------------------------------------------------ video
_FRAME_SCHEMA = "media_id string, frame_idx int, frame_mean double"


def video_frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Sample every n-th frame and emit per-frame statistics — the
    explode-only-on-demand pattern: frames multiply rows, so sampling
    happens inside the worker before anything is emitted."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr, body = _split_payload(bytes(payload))
                w, h, n_frames = int(hdr[0]), int(hdr[1]), int(hdr[3])
                frames = np.frombuffer(body, dtype=np.uint8).reshape(n_frames, h * w)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": i,
                            "frame_mean": float(frames[i].mean()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "video").mapInPandas(run, schema=_FRAME_SCHEMA)
