"""Multimodal column handling: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas functions
via ``mapInPandas``.

The Spark-side plumbing is real and tested — schemas, partitioning, UDF
signatures, batch iteration. Real codecs are import-gated optional
dependencies: ``pillow_image_decoder`` (Pillow) and
``soundfile_audio_decoder`` (soundfile), dispatched by
``codec_for_mime``; when the libraries are absent (as in this container)
``decode_fn`` is injectable and the default raises
``NotImplementedError`` unless ``deterministic_fake=True`` (the test
path, which derives fake features from the payload bytes).

Scale notes: payloads stay in the executors end-to-end (Arrow batches, no
driver collect); metadata extraction is a pure column projection
(codegen'd); per-batch decode parallelism = partition count, so
``repartition(n)`` controls codec fan-out; decoded features land in a flat
``array<float>`` column ready for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata contract for a multimodal asset column.
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_md5", T.StringType(), True),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    ASSET_SCHEMA.fields[:1]
    + [
        T.StructField("mime", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), True),
    ]
)


def to_asset_table(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an opaque binary column in the typed asset contract. Metadata
    (byte length, digest) is a pure projection — no Python."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: FEATURE_DIM byte-histogram
    buckets, normalized. Lets tests exercise the full Arrow path."""
    if payload is None:
        return None
    counts = [0] * FEATURE_DIM
    for byte in payload:
        counts[byte % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def pillow_image_decoder(
    size: tuple[int, int] = (8, 8)
) -> Callable[[bytes], list[float] | None]:
    """Real image codec (optional dependency): Pillow decode → grayscale →
    ``size`` resize → FEATURE_DIM-bucket luminance histogram, normalized —
    same output contract as ``_fake_decode`` so downstream similarity
    operators are agnostic to which codec produced the features.

    Raises ImportError at BUILD time (driver-side, fail-fast) if Pillow is
    absent; the returned closure imports lazily per executor process.
    """
    import importlib

    importlib.import_module("PIL.Image")  # fail fast on the driver

    def decode(payload: bytes) -> list[float] | None:
        import io

        import numpy as np
        from PIL import Image

        if payload is None:
            return None
        img = Image.open(io.BytesIO(payload)).convert("L").resize(size)
        a = np.asarray(img, dtype=np.float32) / 255.0
        hist, _ = np.histogram(a, bins=FEATURE_DIM, range=(0.0, 1.0))
        n = a.size or 1
        return [float(c) / n for c in hist]

    return decode


def soundfile_audio_decoder() -> Callable[[bytes], list[float] | None]:
    """Real audio codec (optional dependency): soundfile decode → mono →
    FEATURE_DIM equal-width amplitude histogram over [-1, 1], normalized.
    Same build-time/lazy-import split as :func:`pillow_image_decoder`."""
    import importlib

    importlib.import_module("soundfile")

    def decode(payload: bytes) -> list[float] | None:
        import io

        import numpy as np
        import soundfile as sf

        if payload is None:
            return None
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32", always_2d=True)
        mono = data.mean(axis=1)
        hist, _ = np.histogram(mono, bins=FEATURE_DIM, range=(-1.0, 1.0))
        n = mono.size or 1
        return [float(c) / n for c in hist]

    return decode


def codec_for_mime(mime: str) -> Callable[[bytes], list[float] | None]:
    """Dispatch a real codec by MIME class, import-gated: image/* → Pillow,
    audio/* → soundfile. Raises ImportError when the library is missing and
    NotImplementedError for MIME classes with no codec wired (video needs a
    frame sampler — see ``frame_sample_plan`` for the planning half)."""
    if mime.startswith("image/"):
        return pillow_image_decoder()
    if mime.startswith("audio/"):
        return soundfile_audio_decoder()
    raise NotImplementedError(f"no codec wired for mime class {mime!r}")


def decode_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes], list[float] | None] | None = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode payloads to feature vectors via mapInPandas (Arrow batches).

    ``decode_fn`` is the pluggable codec (bytes → FEATURE_DIM floats). The
    real image/audio codecs are not available in this environment — without
    an explicit ``decode_fn`` (or ``deterministic_fake`` for tests), the
    stub raises ``NotImplementedError`` at execution time.
    """
    if decode_fn is None:
        if deterministic_fake:
            decode_fn = _fake_decode
        else:
            def decode_fn(_: bytes) -> list[float]:
                raise NotImplementedError(
                    "no media codec in this environment; inject decode_fn "
                    "(e.g. PIL/torchaudio-backed) or use deterministic_fake"
                )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(decode_fn(payload))
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:  # corrupt asset → null features, row kept
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "features": feats,
                    "decode_ok": oks,
                }
            )

    return assets.mapInPandas(run, FEATURES_SCHEMA)
