"""Multimodal span processing: decode / feature-extract plumbing for
image/audio/video media carried as opaque refs (and, at scale, binary
payload columns) inside the interleaved ``spans`` array.

The sandbox has no image/audio libraries, so the DECODE step is a
clearly-marked deterministic stub (`_stub_decode`); everything around
it — span explosion that preserves the parent `spans` column, Arrow
batch shapes, `mapInPandas` signature, output schema, partition-count
preservation — is the real engine plumbing a production decode UDF
would drop into (swap `_stub_decode` for a PIL/ffmpeg call).

Scale notes: media work is per-span embarrassingly parallel, no
shuffle; heavy decode wants `spark.sql.execution.arrow.maxRecordsPerBatch`
lowered so a batch of decoded frames fits executor memory, and a
`repartition(n)` upstream if the source files are few-but-huge.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "width int, height int, n_frames int, feat array<float>"
)

FEAT_DIM = 8


def _stub_decode(refs: pd.Series) -> pd.DataFrame:
    """STUB — stands in for the real decoder (PIL.Image.open /
    torchaudio.load / cv2.VideoCapture), which is unavailable in this
    environment. Deterministic fake: metadata and an 8-dim feature
    vector derived from md5(media_ref), so tests are reproducible and
    the full Arrow round-trip (list<float> feature columns included)
    is exercised end-to-end."""
    widths, heights, frames, feats = [], [], [], []
    for ref in refs:
        h = hashlib.md5(str(ref).encode()).digest()
        widths.append(64 + h[0] * 8)
        heights.append(64 + h[1] * 8)
        frames.append(1 + h[2] % 32)
        feats.append(
            (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)[
                :FEAT_DIM
            ]
        )
    return pd.DataFrame(
        {"width": widths, "height": heights, "n_frames": frames, "feat": feats}
    )


def extract_media_features(docs: DataFrame, kinds: tuple[str, ...] = ("image",)) -> DataFrame:
    """Interleaved documents → one feature row per media span.

    JVM side does the span filtering/explosion (no Python until the
    decode itself); the parent ``spans`` column is NOT projected away
    upstream of the explode, preserving the span-sequence invariant for
    any downstream join back to the documents table.
    """
    kind_col = F.col("s.kind")
    media = docs.select(
        "doc_id",
        F.explode(
            F.filter("spans", lambda s: s["media_ref"] != F.lit(""))
        ).alias("s"),
    ).filter(kind_col.isin(list(kinds))).select(
        "doc_id", kind_col.alias("kind"), F.col("s.media_ref").alias("media_ref")
    )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame(
                    columns=["doc_id", "media_ref", "kind", "width", "height",
                             "n_frames", "feat"]
                )
                continue
            dec = _stub_decode(pdf["media_ref"])
            out = pdf[["doc_id", "media_ref", "kind"]].reset_index(drop=True)
            yield pd.concat([out, dec], axis=1)

    return media.mapInPandas(decode, MEDIA_FEATURES_SCHEMA)
