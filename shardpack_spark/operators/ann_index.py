"""Persistent IVF-PQ vector index on the shardpack container.

``ivfpq_build`` produces an in-session index (encoded codes + coarse
centroids + PQ codebooks); this module makes it durable: codes are
written as a shardpack dataset keyed by coarse bucket, the model
(centroids + codebooks + params) as a single stats record.  A query
then needs NO rebuild: read the model record (one pruned lookup), rank
buckets driver-side, and open ONLY the probed buckets' shards via
key-equality pruning — the on-disk analog of FAISS's IVF list scan.

Layout:

    key      = b/{cid:08d}            (one coarse bucket, multiple
                                       records per key — one per
                                       hash-subsegment so no single
                                       task collects a whole bucket)
    metadata = {"cid": .., "seg": .., "n": ..}
    entries  = codes.json: [{"i": vec_id, "c": [m codes]}, ...]
    + ONE model record under ANN_STATS_KEY with the JSON-encoded
      coarse centroids, codebooks, and id column name.

Scale shape: the index dataset is ~M bytes/vector; writes are
range-partitioned by key so bucket records cluster into shards and a
probe opens O(nprobe) shards.  The subsegment split (xxhash64(id) %
n_subsegments) bounds per-task collect size at |bucket|/n_subsegments
regardless of bucket skew.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANN_STATS_KEY = "\x00ann-model"
CODES_SCHEMA = "array<struct<i:bigint,c:array<int>>>"


def _bucket_key(cid) -> F.Column:
    return F.concat(F.lit("b/"), F.lpad(cid.cast("string"), 8, "0"))


def _codes_rows(encoded: DataFrame, id_col: str, n_subsegments: int) -> DataFrame:
    """Shardpack rows from (id, cid, pq_code): one record per
    (bucket, hash-subsegment)."""
    seg = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_subsegments)).cast("int")
    grouped = (
        encoded.withColumn("__seg", seg)
        .groupBy("cid", "__seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.to_json(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("pq_code").alias("c")))
                )
            ).alias("codes_json"),
        )
    )
    return grouped.select(
        _bucket_key(F.col("cid")).alias("key"),
        F.create_map(
            F.lit("cid"), F.col("cid").cast("string"),
            F.lit("seg"), F.col("__seg").cast("string"),
            F.lit("n"), F.col("n").cast("string"),
        ).alias("metadata"),
        F.array(
            F.struct(
                F.lit("codes.json").alias("file_name"),
                F.lit("application/json").alias("content_type"),
                F.lit("none").alias("encoding"),
                F.octet_length("codes_json").cast("long").alias("size"),
                F.encode(F.col("codes_json"), "utf-8").alias("data"),
            )
        ).alias("entries"),
    )


def save_ann_index(
    encoded: DataFrame,
    coarse: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    n_subsegments: int = 32,
    compression: str = "none",
    index_partitions: int | None = None,
) -> None:
    """Persist an ``ivfpq_build`` result as a shardpack dataset."""
    spark = encoded.sparkSession
    from shardpack_spark.format.datasource import SCHEMA, register

    register(spark)
    rows = _codes_rows(encoded, id_col, n_subsegments)
    model = {
        "id_col": id_col,
        "coarse": [[pos, [float(x) for x in cent]] for pos, cent in coarse],
        "codebooks": [
            [[float(x) for x in cent] for cent in book] for book in codebooks
        ],
    }
    blob = json.dumps(model).encode("utf-8")
    stats = spark.createDataFrame(
        [
            (
                ANN_STATS_KEY,
                {"kind": "ivfpq", "n_coarse": str(len(coarse)), "m": str(len(codebooks))},
                [("model.json", "application/json", "none", len(blob), blob)],
            )
        ],
        SCHEMA,
    )
    n_parts = index_partitions or max(1, spark.sparkContext.defaultParallelism // 2)
    (
        rows.unionByName(stats)
        .repartitionByRange(n_parts, "key")
        .sortWithinPartitions("key")
        .write.format("shardpack")
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )


def load_ann_model(spark: SparkSession, path: str) -> dict:
    """The persisted model: {id_col, coarse, codebooks} (pruned lookup)."""
    from shardpack_spark.format.datasource import read_shardpack

    row = (
        read_shardpack(spark, path)
        .filter(F.col("key") == ANN_STATS_KEY)
        .select(F.col("entries")[0]["data"].alias("blob"))
        .head()
    )
    if row is None:
        raise ValueError(f"no ANN model record in index at {path}")
    model = json.loads(bytes(row["blob"]).decode("utf-8"))
    model["coarse"] = [(int(p), c) for p, c in model["coarse"]]
    return model


def read_ann_codes(
    spark: SparkSession, path: str, cids: list[int] | None = None, id_col: str = "vec_id"
) -> DataFrame:
    """(id_col, cid, pq_code) rows — all buckets, or a key-pruned subset."""
    from shardpack_spark.format.datasource import read_shardpack

    ds = read_shardpack(spark, path)
    if cids is None:
        ds = ds.filter(F.col("key") != ANN_STATS_KEY)
    else:
        keys = [f"b/{int(c):08d}" for c in sorted(set(cids))]
        ds = ds.filter(F.col("key").isin(keys))
    return (
        ds.select(
            F.element_at("metadata", "cid").cast("int").alias("cid"),
            F.from_json(F.col("entries")[0]["data"].cast("string"), CODES_SCHEMA).alias("v"),
        )
        .select("cid", F.explode("v").alias("x"))
        .select(F.col("x.i").alias(id_col), "cid", F.col("x.c").alias("pq_code"))
    )


def ann_index_topk(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k ADC search against a PERSISTED index.

    Ranks coarse buckets driver-side from the model record, reads only
    the nprobe probed buckets (key-equality shard pruning), and scores
    with the same ADC expression as the in-session ``ivfpq_topk`` — the
    two are result-identical (tests pin it).
    """
    from shardpack_spark.operators.quantization import ivfpq_topk, rank_buckets

    model = load_ann_model(spark, path)
    ranked = rank_buckets(model["coarse"], query, nprobe)
    codes = read_ann_codes(
        spark, path, [pos for pos, _ in ranked], id_col=model["id_col"]
    )
    return ivfpq_topk(
        codes,
        model["coarse"],
        model["codebooks"],
        query,
        k=k,
        nprobe=nprobe,
        id_col=model["id_col"],
    )


def encode_with_model(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, pq_code) for NEW vectors under a FROZEN model: codegen
    argmin to the coarse centroids, residual, PQ encode — the exact
    expressions ``ivfpq_build`` uses, minus any training."""
    from shardpack_spark.operators.clustering import _as_double, _assign
    from shardpack_spark.operators.quantization import pq_encode

    id_col = model["id_col"]
    coarse = model["coarse"]
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    assigned = _assign(vecs, coarse)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for _, c in sorted(coarse)]
    )
    residual = F.zip_with(
        F.col("v"), F.element_at(cent_lit, F.col("cluster").cast("int") + 1), lambda a, b: a - b
    )
    res = assigned.select(
        F.col(id_col), F.col("cluster").alias("cid"), residual.alias("v")
    )
    return pq_encode(res, model["codebooks"], "v").select(id_col, "cid", "pq_code")


def update_ann_index(
    df_new: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_subsegments: int = 32,
    compression: str = "none",
) -> int:
    """Add NEW vectors to a persisted index without touching old codes.

    Encodes the batch under the index's frozen model and APPENDS the new
    bucket records — the format allows many records per bucket key, and
    reads union them, so no existing shard is rewritten (contrast the
    postings index, whose per-term records must merge via patches).
    Centroids/codebooks stay frozen, the standard IVF ingestion model;
    retrain+rebuild when drift warrants.  New ids must be disjoint from
    indexed ones.  Returns the number of vectors added.
    """
    spark = df_new.sparkSession
    model = load_ann_model(spark, path)
    encoded = encode_with_model(df_new, model, vec_col).persist()
    n = encoded.count()
    if n == 0:
        encoded.unpersist()
        return 0
    rows = _codes_rows(encoded, model["id_col"], n_subsegments)
    (
        rows.repartitionByRange(
            max(1, spark.sparkContext.defaultParallelism // 2), "key"
        )
        .sortWithinPartitions("key")
        .write.format("shardpack")
        .option("compression", compression)
        .mode("append")
        .save(path)
    )
    encoded.unpersist()
    return int(n)
