"""Frame-delta scene-cut detection — the video segmentation plumbing.

``multimodal_frame_sample`` (multimodal.py) establishes the frame
chunking; this operator adds the canonical first video ANALYSIS over it:
consecutive-frame difference energy and relative-threshold scene cuts —
the shot-boundary pass every video-corpus pipeline runs before sampling
keyframes per shot. Real codecs aren't in the container (the multimodal
family's standing posture), so "frames" are the 64-byte payload blocks
and the difference energy is the byte-wise L1 delta — the Spark-side
plumbing (decode walk, per-frame state, 1-row-in/1-row-out rollup shape,
Arrow batching) is real and the math is exactly what runs on decoded
luma planes in production.

Per clip: delta(i) = Σ_j |b[64i+j] − b[64(i−1)+j]| (positions past the
payload read as 0 — both engines share the padding rule), and frame i is
a CUT iff delta(i) exceeds {CUT_NUM}/{CUT_DEN} of the clip's mean delta,
compared by integer cross-multiplication (delta·n_deltas·DEN >
total·NUM) so no float threshold exists to diverge.

Reference parity: [TGT] — engine extension (SURVEY §2.B multimodal
family).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.multimodal import FRAME_BYTES, as_media
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

CUT_NUM, CUT_DEN = 3, 2  # cut iff delta > 1.5x the clip's mean delta

_B = FRAME_BYTES


@query(
    "multimodal_scene_cut",
    oracle=f"""
    WITH b AS (
        SELECT doc_id AS media_id,
               list_transform(string_split(text, ''), c -> ascii(c)) AS bl,
               octet_length(encode(text)) AS n,
               CAST(GREATEST(CEIL(octet_length(encode(text)) / {_B}.0), 1)
                    AS BIGINT) AS n_frames
        FROM documents
    ), d AS (
        SELECT media_id, n_frames, i,
               CAST(list_sum(list_transform(range(0, {_B}), j ->
                   ABS(CASE WHEN i * {_B} + j < n
                            THEN bl[CAST(i * {_B} + j + 1 AS INTEGER)] ELSE 0 END
                     - CASE WHEN (i - 1) * {_B} + j < n
                            THEN bl[CAST((i - 1) * {_B} + j + 1 AS INTEGER)] ELSE 0 END)
               )) AS BIGINT) AS delta
        FROM (SELECT media_id, bl, n, n_frames,
                     UNNEST(range(1, n_frames)) AS i
              FROM b)
    ), agg AS (
        SELECT media_id,
               CAST(COUNT(*) AS BIGINT) AS n_deltas,
               CAST(SUM(delta) AS BIGINT) AS total_delta
        FROM d GROUP BY media_id
    ), cuts AS (
        SELECT d.media_id,
               CAST(SUM(CASE WHEN d.delta * agg.n_deltas * {CUT_DEN}
                                  > agg.total_delta * {CUT_NUM}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
               CAST(MIN(CASE WHEN d.delta * agg.n_deltas * {CUT_DEN}
                                  > agg.total_delta * {CUT_NUM}
                             THEN d.i END) AS INT) AS first_cut
        FROM d JOIN agg ON d.media_id = agg.media_id
        GROUP BY d.media_id
    )
    SELECT b.media_id, CAST(b.n_frames AS INT) AS n_frames,
           COALESCE(agg.n_deltas, 0) AS n_deltas,
           COALESCE(agg.total_delta, 0) AS total_delta,
           COALESCE(cuts.n_cuts, 0) AS n_cuts,
           cuts.first_cut
    FROM b
    LEFT JOIN agg ON b.media_id = agg.media_id
    LEFT JOIN cuts ON b.media_id = cuts.media_id
    """,
)
def multimodal_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per clip: frame count, consecutive-frame L1 delta totals, and
    relative-threshold scene cuts (count + first cut index; single-frame
    clips have zero deltas and NULL first_cut)."""
    import numpy as np
    import pandas as pd

    media = as_media(load(spark, sf_dir, "documents"))

    def cuts(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(-(-len(raw) // _B), 1) if raw else 1
                padded = np.zeros(n_frames * _B, dtype=np.int64)
                arr = np.frombuffer(raw, dtype=np.uint8)
                padded[: len(arr)] = arr
                frames = padded.reshape(n_frames, _B)
                deltas = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
                n_d = int(deltas.shape[0])
                total = int(deltas.sum())
                cut_mask = deltas * n_d * CUT_DEN > total * CUT_NUM
                n_cuts = int(cut_mask.sum())
                first = (
                    int(np.argmax(cut_mask)) + 1 if n_cuts > 0 else None
                )
                rows.append((int(mid), n_frames, n_d, total, n_cuts, first))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "n_deltas",
                    "total_delta",
                    "n_cuts",
                    "first_cut",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        cuts,
        "media_id long, n_frames int, n_deltas long, total_delta long,"
        " n_cuts long, first_cut int",
    )
