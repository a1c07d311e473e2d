"""Filesystem abstraction for state/stage directory maintenance.

Spark jobs read/write state through DataFrame reader/writer (which
already speak any Hadoop-supported scheme), but the maintenance
bookkeeping around them — listing committed part directories, checking
_SUCCESS markers, two-phase cleanup, tiny JSON sidecars — needs direct
filesystem calls. Locally that's os/shutil; on HDFS/S3/anything with a
URI scheme it must go through the JVM Hadoop FileSystem API (py4j), or
the pipeline silently only works on one box.

`fs_for(spark, path)` returns the right implementation:
  * no scheme -> LocalFs (os/shutil fast path, no py4j round-trips);
  * any scheme (file://, hdfs://, s3a://, ...) -> HadoopFs via py4j.
Tests exercise the HadoopFs code path with file:// URIs — same
physical disk, same API surface as a remote store.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse


def fs_for(spark, path: str):
    """Pick the filesystem implementation for `path` by URI scheme."""
    if urlparse(path).scheme:
        return HadoopFs(spark)
    return LocalFs()


class LocalFs:
    """os/shutil fast path for scheme-less local paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete_recursive(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def same_path(self, a: str, b: str) -> bool:
        return os.path.abspath(a) == os.path.abspath(b)


class HadoopFs:
    """JVM Hadoop FileSystem API via py4j: works for every scheme the
    cluster's Hadoop conf knows (file://, hdfs://, s3a://, gs://, ...).
    Used only for maintenance metadata ops — bulk data still moves
    through the DataFrame reader/writer."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gateway = spark.sparkContext._gateway

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, jpath):
        return jpath.getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        p = self._jpath(path)
        return bool(self._fs(p).exists(p))

    def isdir(self, path: str) -> bool:
        p = self._jpath(path)
        fs = self._fs(p)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        p = self._jpath(path)
        return [st.getPath().getName() for st in self._fs(p).listStatus(p)]

    def mkdirs(self, path: str) -> None:
        p = self._jpath(path)
        self._fs(p).mkdirs(p)

    def delete_recursive(self, path: str) -> None:
        p = self._jpath(path)
        self._fs(p).delete(p, True)

    def read_text(self, path: str) -> str:
        p = self._jpath(path)
        stream = self._fs(p).open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def write_text(self, path: str, data: str) -> None:
        # write-to-tmp + single-op overwrite rename, mirroring LocalFs's
        # os.replace: a crash mid-write never leaves a truncated file AND
        # readers never observe the destination missing. Plain
        # FileSystem.rename cannot overwrite, so the replace goes through
        # FileContext.rename(OVERWRITE) (atomic on HDFS; object stores
        # degrade to copy+delete but still never expose partial bytes).
        tmp = self._jpath(path + ".__tmp__")
        fs = self._fs(tmp)
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()
        dest = self._jpath(path)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                dest.toUri(), self._conf
            )
            rename_enum = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gateway.new_array(rename_enum, 1)
            opts[0] = rename_enum.OVERWRITE
            fc.rename(tmp, dest, opts)
        except Exception as e:
            # Downgrade ONLY for schemes with no AbstractFileSystem
            # binding (some object stores) — transient IO/permission
            # errors must re-raise, not silently delete the committed
            # dest and then possibly fail the replacement rename too
            # (ADVICE r4). py4j wraps the Java exception; match the
            # class name, not the message.
            jexc = getattr(e, "java_exception", None)
            name = jexc.getClass().getName() if jexc is not None else ""
            if "UnsupportedFileSystemException" not in name:
                raise
            import sys

            print(
                f"clann_spark.fs: no AbstractFileSystem binding for "
                f"{dest.toUri().getScheme()} — non-atomic delete+rename "
                f"fallback for {path}",
                file=sys.stderr,
            )
            # fall back to delete+rename — NOT atomic (a reader can
            # observe dest absent between the two ops), which is the
            # best such stores offer short of a marker protocol
            if fs.exists(dest):
                fs.delete(dest, False)
            if not fs.rename(tmp, dest):
                raise OSError(f"rename {tmp} -> {dest} failed")

    def same_path(self, a: str, b: str) -> bool:
        # Hadoop Path normalizes trailing slashes / redundant separators
        return str(self._jpath(a)) == str(self._jpath(b))
