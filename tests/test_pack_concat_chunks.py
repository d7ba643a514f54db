"""Concat-and-chunk packing: reconstruction vs a pure-Python stream,
bucket-path equality, EOS/drop_last variants, zero-token docs."""

import random

import pytest

from gbdc_spark.operators.packing import pack_concat_chunks


def _py_concat_chunks(docs, block_size, eos_id=0, drop_last=True):
    """docs: list of (key, tokens) — concat in key order, chunk."""
    stream = []
    for _k, toks in sorted(docs, key=lambda d: d[0]):
        stream.extend(toks)
        if eos_id is not None:
            stream.append(eos_id)
    blocks = {}
    for i in range(0, len(stream), block_size):
        blk = stream[i : i + block_size]
        if drop_last and len(blk) < block_size:
            continue
        blocks[i // block_size] = blk
    return blocks


def _fixture(seed=7, n=60):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        # idx%13==4 → zero-token docs (EOS-only contribution)
        m = 0 if i % 13 == 4 else rng.randint(1, 40)
        docs.append(
            (f"d{i:04d}", [rng.randint(-8, 9) for _ in range(m)])
        )
    return docs


def _collect(df):
    return {
        r["block_id"]: list(r["tokens"])
        for r in df.collect()
    }


@pytest.mark.parametrize("block_size", [16, 17, 64])
def test_matches_python_stream(spark, block_size):
    docs = _fixture()
    sdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    got = _collect(pack_concat_chunks(sdf, block_size))
    assert got == _py_concat_chunks(docs, block_size)


def test_bucketed_path_identical(spark):
    docs = _fixture(seed=11, n=80)
    sdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    single = _collect(pack_concat_chunks(sdf, 32))
    # prefix 3 = "d00".."d07" → ~10-doc buckets; every block straddles
    bucketed = _collect(pack_concat_chunks(sdf, 32, bucket_prefix=3))
    assert single == bucketed


def test_numeric_bucket_width(spark):
    docs = [(i, [i % 5] * (i % 7 + 1)) for i in range(50)]
    sdf = spark.createDataFrame(docs, "doc_id int, tokens array<int>")
    single = _collect(pack_concat_chunks(sdf, 16, key="doc_id"))
    bucketed = _collect(
        pack_concat_chunks(sdf, 16, key="doc_id", bucket_width=8)
    )
    assert single == bucketed
    assert single == _py_concat_chunks(
        [(f"{k:06d}", t) for k, t in docs], 16
    )


def test_drop_last_false_keeps_tail(spark):
    docs = _fixture(seed=3, n=10)
    sdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    want = _py_concat_chunks(docs, 64, drop_last=False)
    got = _collect(pack_concat_chunks(sdf, 64, drop_last=False))
    assert got == want
    total = sum(len(t) + 1 for _, t in docs)
    assert sum(len(v) for v in got.values()) == total


def test_no_eos(spark):
    docs = _fixture(seed=5, n=30)
    sdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    got = _collect(pack_concat_chunks(sdf, 16, eos_id=None))
    assert got == _py_concat_chunks(docs, 16, eos_id=None)


def test_blocks_are_exact_size_and_contiguous(spark):
    docs = _fixture(seed=9, n=40)
    sdf = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    got = _collect(pack_concat_chunks(sdf, 24))
    assert all(len(v) == 24 for v in got.values())
    assert sorted(got) == list(range(len(got)))


def test_bucket_width_numeric_order_past_ten_buckets(spark):
    """Numeric bucket_width must bucket in NUMERIC order: with >10
    buckets a string-typed bucket column would sort "10" before "2"
    and corrupt the global offsets (the regression the tokenize_pack
    composed oracle caught)."""
    from pyspark.sql import functions as F

    from gbdc_spark.operators.packing import pack_concat_chunks

    df = spark.createDataFrame(
        [(i, list(range(i % 5 + 1))) for i in range(1, 401)],
        "doc_id long, tokens array<int>",
    )

    def blocks(**kw):
        return sorted(
            (r["block_id"],
             ",".join(str(t) for t in r["tokens"]))
            for r in pack_concat_chunks(
                df, block_size=64, drop_last=False, **kw
            ).collect()
        )

    base = blocks()                     # single-window reference
    assert blocks(bucket_width=25) == base   # 16 numeric buckets
    assert blocks(bucket_width=7) == base    # 58 buckets
