"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed through Arrow-batched pandas iterators.

The image/audio codecs are NOT in this container, so the DEFAULT
decode step is a deterministic fake-feature stub — but the decoder is
pluggable (round 6): ``register_decoder(modality, fn)`` installs a
real ``bytes -> list[float]`` featurizer (e.g. a PIL thumbnail-pixel
embedding; ``register_pil_image_decoder`` wires one up when PIL is
importable and is skipped cleanly when it is not).  The Spark-side
machinery is real and tested either way: schema, ``mapInPandas``
batch iteration, partition-sized batching, and the metadata columns a
100 TB multimodal pipeline needs for partition pruning (modality,
byte size, content digest).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, modality string, payload binary, "
                "mime string, n_bytes long, sha bigint")

FEATURE_SCHEMA = ("media_id long, modality string, n_bytes long, "
                  "feat array<float>")


def make_media_table(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Wrap a text table's bytes as opaque media payloads — the
    deterministic stand-in for real image/audio blobs (no codecs in
    this environment).  Output schema == MEDIA_SCHEMA."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.lit(f"application/x-fake-{modality}").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.xxhash64(payload).alias("sha"))


def _fake_decode(payload: bytes, modality: str, n_feat: int) -> list[float]:
    """Deterministic fake feature vector (stands in for a real decoder
    such as PIL/libav — raise NotImplementedError for real codecs)."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    # cheap rolling hash -> n_feat floats in [0, 1)
    acc, out = 2166136261, []
    for i in range(n_feat):
        chunk = payload[i::n_feat] or b"\x00"
        h = acc
        for byte in chunk[:64]:
            h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
        out.append((h % 10_000) / 10_000.0)
        acc = h
    return out


# decoder registry: modality -> (payload bytes, n_feat) -> list[float].
# The deterministic fake is the default for every modality; a real
# codec plugs in per modality without touching the Spark plumbing.
_DECODERS: dict[str, Callable[[bytes, int], list[float]]] = {}


def register_decoder(modality: str,
                     fn: Callable[[bytes, int], list[float]]) -> None:
    """Install a real featurizer for ``modality`` — called once per
    payload with (payload_bytes, n_feat), must return ``n_feat``
    floats.  Replaces the deterministic fake for that modality in
    every subsequent ``extract_features`` call."""
    _DECODERS[modality] = fn


def unregister_decoder(modality: str) -> None:
    _DECODERS.pop(modality, None)


def register_pil_image_decoder(thumb: int = 4) -> bool:
    """Wire a REAL image decoder (PIL) into the registry when the
    codec is importable: decode -> ``thumb`` x ``thumb`` grayscale
    thumbnail -> first ``n_feat`` pixel intensities in [0, 1).
    Returns False (registry untouched) when PIL is absent — the
    documented no-codecs-in-container case."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        return False

    def _pil_decode(payload: bytes, n_feat: int) -> list[float]:
        img = Image.open(BytesIO(payload)).convert("L")
        img = img.resize((thumb, thumb))
        px = list(img.getdata())
        out = [(px[i % len(px)]) / 256.0 for i in range(n_feat)]
        return out

    register_decoder("image", _pil_decode)
    return True


def extract_features(media: DataFrame, n_feat: int = 8) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (Arrow batches; the
    decoder sees a pandas batch, never a Python row loop over Spark).
    Per-modality decoders come from the registry (``register_decoder``);
    unregistered modalities use the deterministic fake.
    Output schema == FEATURE_SCHEMA."""
    decoders = dict(_DECODERS)  # captured into the task closure

    def _decode(payload: bytes, modality: str) -> list[float]:
        fn = decoders.get(modality)
        if fn is not None:
            return fn(payload, n_feat)
        return _fake_decode(payload, modality, n_feat)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "feat": feats,
            })

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 256,
                 max_frames: int = 16) -> DataFrame:
    """'Frame sampling' plumbing: split each payload into fixed-stride
    chunks (stand-in for video frame extraction) ->
    (media_id, frame_idx, frame: binary).  Pure Catalyst slicing."""
    idx = F.sequence(
        F.lit(0),
        F.least(F.floor((F.col("n_bytes") - 1) / every_n_bytes),
                F.lit(max_frames - 1)))
    frames = F.transform(
        idx, lambda i: F.struct(
            i.cast("long").alias("frame_idx"),
            F.substring(F.col("payload"), (i * every_n_bytes + 1).cast("int"),
                        every_n_bytes).alias("frame")))
    return (media.where(F.col("n_bytes") > 0)
            .select("media_id", F.explode(frames).alias("f"))
            .select("media_id", "f.frame_idx", "f.frame"))
