"""size_shuffle_partitions (session.py): the corpus-scaled shuffle rule
the round-6 x100 inverted-index runs discovered by hand (VERDICT r6 #7),
now a helper — fixture scale must be a NO-OP, big corpora must land at
the measured ~128-partition tier, and the conf must actually move."""

from __future__ import annotations

import os
import tempfile

from broadway_kinesis_spark.session import (
    INDEX_SHUFFLE_EXPANSION,
    TARGET_PARTITION_BYTES,
    size_shuffle_partitions,
)


def _sparse_docs_dir(td: str, nbytes: int) -> str:
    # st_size is all the helper reads; a sparse file costs no disk.
    path = os.path.join(td, "documents.parquet")
    with open(path, "wb") as f:
        f.truncate(nbytes)
    return td


def test_noop_at_fixture_scale(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    parts = size_shuffle_partitions(spark, "/root/testdata/sf0.01")
    assert parts == int(before)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_scales_with_corpus_and_sets_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with tempfile.TemporaryDirectory() as td:
            nbytes = 69 << 20  # the fresh-x100 documents.parquet size
            parts = size_shuffle_partitions(spark, _sparse_docs_dir(td, nbytes))
            # the measured tier: ~128+ partitions for the 69 MB corpus
            assert parts >= 100
            expanded = nbytes * INDEX_SHUFFLE_EXPANSION
            assert parts <= max(expanded // (8 << 20), int(before))
            assert int(spark.conf.get("spark.sql.shuffle.partitions")) == parts
            # per-partition expanded bytes within the target
            assert expanded / parts <= TARGET_PARTITION_BYTES + 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_missing_table_is_empty_corpus(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with tempfile.TemporaryDirectory() as td:
        parts = size_shuffle_partitions(spark, td)
    assert parts == int(before)
