"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video alongside text
as opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract stages are Arrow-batched ``mapInPandas`` kernels. The
image/audio codec libraries are not available in this container, so the
decode step is STUBBED: ``decode_assets(..., fake=True)`` produces a
deterministic fake decode (dimensions derived from payload bytes) while
keeping the Spark-side plumbing — schema, batch iteration, partition
behavior, output struct — fully real and tested. With ``fake=False`` the
kernel raises ``NotImplementedError`` at the exact point a real codec
(PIL / soundfile / pyav) would be invoked.

The payload itself never transits a shuffle in these plans: metadata is
computed in-place (codegen'd byte ops), and decode emits only the derived
features, dropping the blob before any wide operation — the rule that
keeps shuffle volume sane when payload >> metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, n_bytes long, magic_hex string"
)

_KIND_BY_LANG = {"en": "image", "de": "audio", "es": "video", "fr": "image", "zh": "audio"}


def attach_payloads(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an asset table from the documents corpus: the UTF-8
    bytes of the text stand in for an opaque media payload. Deterministic
    (no RNG) so the driver oracle can mirror the metadata columns."""
    kind = F.lit("binary")
    if "lang" in docs.columns:
        kind = F.coalesce(
            *[F.when(F.col("lang") == k, v) for k, v in _KIND_BY_LANG.items()],
            F.lit("binary"),
        )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring(F.hex(payload), 1, 8).alias("magic_hex"),
    )


DECODED_SCHEMA = "asset_id long, kind string, width int, height int, n_frames int, checksum long"


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode stage: binary payload -> typed features, one Arrow batch at
    a time. Real codec wiring is the only stubbed line; everything else
    (column pruning, batch shape, output schema) is production-shaped."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                b = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires PIL/soundfile/pyav; "
                        "not available in this environment"
                    )
                # deterministic fake decode: dims derived from payload bytes
                checksum = sum(b[:256]) + len(b)
                width = 16 + (checksum % 241)
                height = 16 + ((checksum // 7) % 241)
                n_frames = 1 if kind == "image" else 1 + (checksum % 30)
                rows.append((int(asset_id), kind, width, height, n_frames, checksum))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "width", "height", "n_frames", "checksum"],
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = "asset_id long, kind string, width int, height int, payload binary"


def resize_assets(assets: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True) -> DataFrame:
    """Resize stage: payload -> fixed-dimension payload (the model-input
    normalization step of an image pipeline). Fake path: deterministic
    byte subsampling to ``target_w * target_h // 64`` bytes (output size
    scales with target area, content is a pure function of input bytes);
    real path raises at the exact PIL/cv2 call site. One Arrow batch at
    a time; the output payload is the ONLY binary column carried forward.
    """
    stride = 64

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(1, target_w * target_h // stride)
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                b = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real resize requires PIL/cv2; not available in this environment"
                    )
                step = max(1, len(b) // out_len)
                rows.append((int(asset_id), kind, target_w, target_h, b[::step][:out_len]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "width", "height", "payload"]
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Frame-sampling stage for video/audio payloads: flatMap shape — one
    OUTPUT ROW PER SAMPLED FRAME (X5 fan-out over mapInPandas), so a
    10^12-asset corpus parallelizes per input partition and downstream
    stages see frames as plain rows. Fake path: the i-th frame is a
    deterministic byte slice of the payload with a synthetic timestamp;
    real path raises at the pyav/ffmpeg call site. Non-temporal kinds
    (images) emit exactly one frame.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                b = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling requires pyav/ffmpeg; "
                        "not available in this environment"
                    )
                n = 1 if kind == "image" else min(max_frames, 1 + len(b) % max_frames)
                for i in range(n):
                    lo = (i * max(1, len(b) // max(n, 1))) if b else 0
                    rows.append((int(asset_id), i, i * every_ms, b[lo : lo + 64]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "ts_ms", "frame"])

    return assets.select("asset_id", "kind", "payload").mapInPandas(sample, FRAME_SCHEMA)


def asset_metadata_report(assets: DataFrame) -> DataFrame:
    """Per-kind size stats — metadata-only plan; the blob column is pruned
    from the scan (verify via .explain ReadSchema)."""
    return (
        assets.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 2).alias("mean_bytes"),
        )
        .orderBy("kind")
    )
