"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The real decode (image/audio libs) is NOT available in this container, so
``decode_image_stub`` computes deterministic fake features from the bytes;
the Spark-side contract — binary column, explicit output schema, batched
Pandas iteration, no driver collection — is the real, tested part. Swap
the stub body for PIL/librosa on a real cluster and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, checksum bigint, "
    "fake_width int, fake_height int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media column: utf-8 bytes of text stand in for an
    encoded image. Real data would already carry BinaryType."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_stub(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Decode' each payload into metadata via mapInPandas (Arrow batches).

    STUB: features are deterministic functions of the bytes (length, first
    byte, additive checksum, fake dimensions). A real impl would call
    PIL.Image.open(BytesIO(payload)) here — NotImplementedError territory
    in this container.
    """
    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda b: b[0] if len(b) else -1)
            checksum = payloads.map(lambda b: sum(b) % 1_000_003)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "first_byte": first.astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "fake_width": (checksum % 640).astype("int32"),
                    "fake_height": (checksum % 480).astype("int32"),
                }
            )

    return src.mapInPandas(decode, schema=DECODE_SCHEMA)
