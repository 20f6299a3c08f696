"""Object-store utilities over the Hadoop FileSystem API (reference
S12: the S3 copy/list/delete helpers in `resources/io_managers.py:71-91`).

The reference talks to S3 with boto3; the Spark-native equivalent is
the Hadoop ``FileSystem`` interface, which resolves the right backend
from the path scheme (``s3a://``, ``hdfs://``, ``file://``, ...) and
shares the cluster's credential/endpoint configuration — no second
client stack to configure. All calls are driver-side metadata/stream
operations, exactly like the reference's; tested hermetically against
``file://`` paths.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class FileInfo:
    path: str
    size: int
    is_dir: bool
    mtime_ms: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def list_objects(spark: SparkSession, path: str) -> list[FileInfo]:
    """Non-recursive listing of a directory (or the single object), as
    the reference's bucket listing does for manifest bookkeeping."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        out.append(
            FileInfo(
                path=st.getPath().toString(),
                size=int(st.getLen()),
                is_dir=bool(st.isDirectory()),
                mtime_ms=int(st.getModificationTime()),
            )
        )
    return sorted(out, key=lambda f: f.path)


def glob_objects(spark: SparkSession, pattern: str) -> list[FileInfo]:
    """Glob expansion (``*``, ``?``, ``[abc]``, ``{a,b}``) — the shape
    the reference uses to fan partitioned parquet paths into one read
    (`assets/flood/discharge.py:198-211`)."""
    fs, jpath = _fs_and_path(spark, pattern)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return sorted(
        (
            FileInfo(
                path=st.getPath().toString(),
                size=int(st.getLen()),
                is_dir=bool(st.isDirectory()),
                mtime_ms=int(st.getModificationTime()),
            )
            for st in statuses
        ),
        key=lambda f: f.path,
    )


def copy(
    spark: SparkSession, src: str, dst: str, overwrite: bool = True
) -> None:
    """Server-side-when-possible object copy (reference
    `io_managers.py:71-80` copies processed artifacts between prefixes)."""
    src_fs, jsrc = _fs_and_path(spark, src)
    dst_fs, jdst = _fs_and_path(spark, dst)
    jvm = spark._jvm
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(
        src_fs, jsrc, dst_fs, jdst, False, overwrite,
        spark._jsc.hadoopConfiguration(),
    )
    if not ok:
        raise IOError(f"copy failed: {src} -> {dst}")


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """Delete an object or prefix; returns whether anything was removed
    (reference `io_managers.py:82-91` clears stale outputs before a
    re-materialization)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def mkdirs(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.mkdirs(jpath))
