"""write_training_shards: deterministic shard layout for training data."""

import pathlib

from reflinkcep_spark.sinks import write_training_shards
from reflinkcep_spark.sources import load_table

from tests.conftest import SF_DIR


def test_training_shards_deterministic_layout(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    out = tmp_path / "shards"
    write_training_shards(docs, str(out), n_shards=8, order_col="doc_id")

    # partitioned layout: every shard dir exists, one data file each
    dirs = sorted(p.name for p in out.iterdir() if p.name.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(8)]
    for d in dirs:
        files = [f for f in (out / d).iterdir() if f.suffix == ".parquet"]
        assert len(files) == 1

    back = spark.read.parquet(str(out))
    rows = back.select("doc_id", "shard").collect()
    # total preservation: every doc in exactly one shard
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)

    # the mapping is the documented md5-bucket function of the id alone
    import hashlib

    def expect_shard(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 8

    assert all(r["shard"] == expect_shard(r["doc_id"]) for r in rows)

    # rewriting (different input partitioning) moves no row
    write_training_shards(
        docs.repartition(13), str(out), n_shards=8, order_col="doc_id"
    )
    again = {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(str(out)).select("doc_id", "shard").collect()
    }
    assert again == {r["doc_id"]: r["shard"] for r in rows}
