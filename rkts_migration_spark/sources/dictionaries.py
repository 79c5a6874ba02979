"""Dictionary/side-input sources (SURVEY.md §2.1 S2-S7 analogs).

Every loader returns a DataFrame shaped for a broadcast join — these
are the reference's driver-state hash maps re-expressed as tables:
- multimap CSV (rkts-actors shape: id,prop,obj — utils.php:852-870)
- filtered map CSV (abstract-rkts shape, '?'/empty dropped —
  utils.php:872-897)
- plain map CSV (volume_numbers shape — sqltoxml.py:6-11)
- gzipped JSON image lists (il-cache shape [{filename,width,height}]
  — utils.php:199-209,299-310); Spark reads .gz transparently
- pagination JSON maps idx -> {pagination,psection,file}
  (migrate-bvm.py:196-203)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_multimap_csv(
    spark: SparkSession, path: str,
    id_col: str = "id", prop_col: str = "prop", obj_col: str = "obj",
) -> DataFrame:
    """(id, prop, obj) rows; group to (id, prop, objs array) — the
    multimap shape. Callers broadcast-join then explode(objs)."""
    schema = T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField(prop_col, T.StringType()),
        T.StructField(obj_col, T.StringType()),
    ])
    df = spark.read.csv(path, schema=schema, header=False)
    return df.groupBy(id_col, prop_col).agg(
        F.collect_list(obj_col).alias("objs"))


def read_filtered_map_csv(
    spark: SparkSession, path: str,
    key_col: str = "key", val_col: str = "val",
) -> DataFrame:
    """(key, val) map dropping rows whose key is empty or contains '?'
    (utils.php:884-885 parity); min(val) wins on duplicate keys
    (order-free tie-break)."""
    schema = T.StructType([
        T.StructField(val_col, T.StringType()),
        T.StructField(key_col, T.StringType()),
    ])
    df = spark.read.csv(path, schema=schema, header=False)
    return (
        df.filter(
            (F.length(F.trim(F.col(key_col))) > 0)
            & ~F.col(key_col).contains("?")
        )
        .groupBy(key_col)
        .agg(F.min(val_col).alias(val_col))
    )


def read_map_csv(
    spark: SparkSession, path: str,
    key_col: str = "key", val_col: str = "val", val_type: str = "string",
) -> DataFrame:
    df = spark.read.csv(
        path, schema=f"{key_col} string, {val_col} {val_type}", header=False)
    return df


IMAGE_LIST_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("filename", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
]))


def read_image_lists(spark: SparkSession, glob_path: str) -> DataFrame:
    """il-cache-shaped gzipped JSON arrays -> (volume, imgnum, filename,
    width, height); volume derived from the file name, imgnum is the
    1-based array position (the reference's fnametoimgnum map,
    utils.php:304-310, as a table)."""
    raw = spark.read.text(glob_path, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value"))
    vol = F.regexp_extract(F.col("path"), r"([^/]+?)\.json(?:\.gz)?$", 1)
    arr = F.from_json(F.col("value"), IMAGE_LIST_SCHEMA)
    return raw.select(vol.alias("volume"), F.posexplode(arr)).select(
        "volume",
        (F.col("pos") + 1).cast("int").alias("imgnum"),
        F.col("col.filename").alias("filename"),
        F.col("col.width").alias("width"),
        F.col("col.height").alias("height"),
    )


PAGINATION_VALUE = T.StructType([
    T.StructField("pagination", T.StringType()),
    T.StructField("psection", T.StringType()),
    T.StructField("file", T.StringType()),
])


def read_pagination_maps(spark: SparkSession, glob_path: str) -> DataFrame:
    """Pagination JSON {idx: {pagination,psection,file}} -> one row per
    idx, numerically ordered idx (the ksort analog, utils.php:238)."""
    raw = spark.read.text(glob_path, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value"))
    vol = F.regexp_extract(F.col("path"), r"([^/]+?)\.json(?:\.gz)?$", 1)
    m = F.from_json(F.col("value"), T.MapType(T.StringType(), PAGINATION_VALUE))
    return raw.select(vol.alias("volume"), F.explode(m)).select(
        "volume",
        F.col("key").cast("int").alias("idx"),
        F.col("value.pagination").alias("pagination"),
        F.col("value.psection").alias("psection"),
        F.col("value.file").alias("file"),
    )
