"""Scheme-aware small-file IO for workdir artifacts (resume markers,
segmentation/TransE model JSON, lineage).

Plain local paths use the OS directly (fast, no JVM round trip). Any path
carrying a URI scheme — ``file://``, ``hdfs://``, ``s3a://``, ``gs://`` …
— routes through the Hadoop FileSystem API of the active SparkSession's
JVM, so ``--workdir s3a://bucket/wd`` genuinely resumes instead of
silently recomputing (the failure mode this module replaces: os.path
checks on object-store URIs are always False, and ``open()`` writes to a
bogus local ``s3:/…`` directory).

Writes are atomic per the backing store's rename semantics: write to
``<path>.tmp`` then rename (object stores implement rename as
copy+delete — still never a torn file at the final name).
"""

from __future__ import annotations

import os


def is_remote(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"workdir {path!r} has a URI scheme but no active SparkSession "
            "to reach the Hadoop FileSystem API")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    _jvm, fs, jpath = _fs(path)
    return bool(fs.exists(jpath))


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    _jvm, fs, jpath = _fs(path)
    fs.mkdirs(jpath)


def read_text(path: str) -> str | None:
    if not is_remote(path):
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    jvm, fs, jpath = _fs(path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text_atomic(path: str, data: str) -> None:
    if not is_remote(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(data)
        os.replace(tmp, path)
        return
    jvm, fs, jpath = _fs(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(data.encode("utf-8")))
    finally:
        stream.close()
    # Atomic overwrite-rename where the store supports it (HDFS/posix via
    # FileContext.rename(…, OVERWRITE) — no delete window in which a crash
    # loses BOTH files); stores without FileContext fall back to
    # delete+rename with the rename result checked.
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        gw = spark.sparkContext._gateway
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jpath.toUri(), spark._jsc.hadoopConfiguration())
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, jpath, opts)
    except Exception:
        if fs.exists(jpath):
            fs.delete(jpath, False)
        if not fs.rename(tmp, jpath):
            raise IOError(f"rename {tmp} -> {jpath} failed")
