"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §2.11). Images/audio/video are opaque
``binary`` columns with a metadata struct; decode / feature-extract /
frame-sample run as Arrow-batched ``mapInPandas`` operators so the
Python stage sees columnar batches, not rows. The actual media codecs
are NOT in this container, so the decode step is stubbed
(``NotImplementedError``) — but the Spark-side plumbing (schema,
batch iteration, partition parallelism, UDF signatures) is real and
tested, and the deterministic byte-level extractors are
oracle-checked end-to-end through the same mapInPandas path.

Scale notes: binary payloads ride the normal columnar pipeline
(parquet BYTE_ARRAY); mapInPandas processes one Arrow batch at a
time, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x payload size —
tune that down for large media. Feature extraction is
embarrassingly parallel: no shuffle enters or leaves the operator.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd


def attach_binary(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, meta struct<mime,n_bytes>) from text.

    Stand-in for reading real media blobs: encodes the UTF-8 text as
    the payload. With real data this is ``spark.read.format('binaryFile')``
    or a parquet binary column.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def binary_stats(with_payload: DataFrame) -> DataFrame:
    """mapInPandas byte-level extractor: (doc_id, n_bytes, byte_sum, head8).

    Deterministic, codec-free feature extraction — the pattern a real
    image/audio featurizer follows (same batch shape, same schema
    contract), checkable against a SQL oracle because the features
    are byte arithmetic.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "byte_sum": payloads.map(lambda b: int(sum(b))),
                    "head8": payloads.map(
                        lambda b: bytes(b[:8]).decode("utf-8", "replace")
                    ),
                }
            )

    return with_payload.mapInPandas(
        extract, "doc_id long, n_bytes long, byte_sum long, head8 string"
    )


def frame_sample(
    with_payload: DataFrame,
    bytes_per_frame: int = 100,
    max_frames: int = 5,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame'.

    A video decoder would emit decoded frames here; the stub treats
    every ``bytes_per_frame`` bytes as one frame and samples the first
    ``max_frames``. Output (doc_id, frame_idx, frame_offset, frame_bytes).
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(len(payload) // bytes_per_frame, max_frames)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * bytes_per_frame)
                    out["frame_bytes"].append(bytes_per_frame)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(
        sample,
        "doc_id long, frame_idx int, frame_offset long, frame_bytes long",
    )


def decode_media(with_payload: DataFrame, kind: str) -> DataFrame:
    """Decode image/audio/video payloads into pixel/sample tensors.

    STUB: the media codecs (PIL, torchaudio, pyav, ...) are not in
    this container. The call signature and output schema are the
    engine contract a real deployment fills in:
    (doc_id, tensor array<float>, shape array<int>).
    """
    raise NotImplementedError(
        f"decode_media(kind={kind!r}): media codecs are not available in "
        "this environment. Plug a decoder into the mapInPandas slot used "
        "by binary_stats()/frame_sample(); the batch plumbing, schema "
        "contract and partition parallelism are already in place."
    )
