"""Parquet-backed vector collection — the reference's vector-store
surface (scripts/milvus_db.py ZillizClient) as a Spark-native library.

A collection is a parquet directory + a tiny JSON manifest (dim,
metric, primary field). All operations are DataFrame plans; inserts
are append-only parquet writes with last-write-wins upsert resolution
at read time (a standard LSM-flavored pattern — no file rewrites on
the write path, compaction is an explicit maintenance call).

At 100 TB: a collection is just partitioned parquet — reads get
pushdown/pruning, inserts are distributed writes, search is
operators.knn/ann over the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import knn


def list_collections(root: str) -> list[dict]:
    """milvus_db.py:36 list_collections: every collection directory
    (has a _manifest.json) under ``root`` with its manifest."""
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        mp = os.path.join(root, name, "_manifest.json")
        if os.path.isfile(mp):
            with open(mp) as f:
                out.append({"collectionName": name, **json.load(f)})
    return out


class VectorCollection:
    """Mirrors ZillizClient's collection API (milvus_db.py:14)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_manifest.json")) as f:
            m = json.load(f)
        self.dim = m["dimension"]
        self.metric = m["metricType"]
        self.id_col = m["primaryField"]
        self.vec_col = m["vectorField"]

    # -- lifecycle (milvus_db.py:40 create_collection) --

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        dimension: int,
        metric: str = "cosine",
        primary_field: str = "id",
        vector_field: str = "vector",
    ) -> "VectorCollection":
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_manifest.json"), "w") as f:
            json.dump(
                {
                    "dimension": dimension,
                    "metricType": metric,
                    "primaryField": primary_field,
                    "vectorField": vector_field,
                },
                f,
            )
        return cls(spark, path)

    def _data_path(self) -> str:
        return os.path.join(self.path, "data")

    def _has_data(self) -> bool:
        p = self._data_path()
        return os.path.isdir(p) and any(n.endswith(".parquet") for n in os.listdir(p))

    # -- writes (milvus_db.py:61 insert_vectors) --

    def insert(self, df: DataFrame) -> None:
        """Append a batch; a monotonically increasing _batch stamp makes
        upserts last-write-wins at read time."""
        batch = self._next_batch_id()
        (
            df.withColumn("_batch", F.lit(batch))
            .write.mode("append")
            .parquet(self._data_path())
        )

    def _next_batch_id(self) -> int:
        if not self._has_data():
            return 0
        return (
            self.spark.read.parquet(self._data_path())
            .agg(F.max("_batch"))
            .first()[0]
            + 1
        )

    def compact(self) -> None:
        """Materialize the resolved view (maintenance; optional).

        Crash-safe swap: write the resolved view to a tmp directory,
        rename the live data dir aside, rename tmp into place, then
        drop the old dir. No read-back-and-overwrite of the live dir
        (a failure mid-overwrite there would destroy the collection),
        and the tmp dir never outlives the call. A crash between the
        two renames leaves `<data>_old` intact for manual recovery.
        (On object stores, directory rename is not atomic — there,
        compaction swaps a manifest pointer instead.)"""
        import shutil

        final = self._data_path()
        tmp = final + "_compacting"
        old = final + "_old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        try:
            self.df().withColumn("_batch", F.lit(0)).write.mode(
                "overwrite"
            ).parquet(tmp)
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # -- reads --

    def df(self) -> DataFrame:
        """Resolved collection: latest batch wins per primary key."""
        raw = self.spark.read.parquet(self._data_path())
        w = Window.partitionBy(self.id_col).orderBy(F.col("_batch").desc())
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_batch")
        )

    def query(
        self,
        filter: str | None = None,
        output_fields: list[str] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """milvus_db.py:51 query_entities: filter string + projection +
        limit with deterministic order."""
        df = self.df()
        if filter:
            df = df.filter(filter)
        if output_fields and output_fields != ["*"]:
            df = df.select(*output_fields)
        df = df.orderBy(self.id_col) if self.id_col in df.columns else df
        if limit is not None:
            df = df.limit(limit)
        return df

    def get_by_ids(self, ids: list) -> DataFrame:
        """milvus_db.py:99 get_entities_by_ids."""
        return self.df().filter(F.col(self.id_col).isin(ids))

    def scan(self, batch_size: int = 100):
        """milvus_db.py:77 get_all_entities: stable-order paginated
        iterator (driver-side paging over a sorted snapshot)."""
        df = self.df().orderBy(self.id_col)
        offset = 0
        while True:
            batch = df.offset(offset).limit(batch_size).collect()
            if not batch:
                return
            yield batch
            offset += batch_size

    def stats(self) -> dict:
        """milvus_db.py:70 get_collection_stats."""
        n = self.df().count()
        return {
            "collectionName": os.path.basename(self.path),
            "rowCount": n,
            "dimension": self.dim,
            "metricType": self.metric,
            # complete the describe payload (milvus_db.py:40's create
            # fields echoed back, as collections/describe does)
            "primaryField": self.id_col,
            "vectorField": self.vec_col,
        }

    # -- search (milvus_db.py:107 search_vectors) --

    def search(self, vector: list[float], limit: int = 5) -> DataFrame:
        return knn.topk(
            self.df(),
            vector,
            k=limit,
            id_col=self.id_col,
            vec_col=self.vec_col,
            metric=self.metric,
        )
