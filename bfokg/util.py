"""Small shared utilities."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def attach_cleanup(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach a ``release_intermediates()`` handle to an operator's output.

    Several operators persist intermediates (MinHash signatures, SimHash
    fingerprints, routing tables, closure frontiers) that the returned
    lazy DataFrame still depends on — they cannot be unpersisted inside the
    operator without recomputing the cached work at action time. Long-lived
    sessions that call such operators repeatedly should release the cache
    once the consuming action has completed::

        pairs = minhash_lsh_pairs(docs)
        pairs.write.parquet(out)
        release_intermediates(pairs)

    Composing operators propagate handles by passing the upstream result's
    cached frames along.
    """
    existing = getattr(result, "_bfokg_cached", ())
    result._bfokg_cached = tuple(existing) + tuple(cached)
    return result


class PathCleanup:
    """A cleanup handle for operators that materialize intermediates to
    a scratch parquet path instead of the block cache (arrays decode much
    faster off parquet's vectorized reader than off the generic-object
    columnar cache — see dedup.minhash_lsh_pairs). Releasing DELETES the
    files: unlike unpersisting a cached frame (which merely recomputes on
    re-use), a released parquet-backed result must not be consumed again.

    Deletion goes through the Hadoop FileSystem API only for
    SCHEME-QUALIFIED paths (``hdfs://``, ``s3a://``, ``file:/`` — scratch
    dirs landing under a non-local configured checkpoint dir on a real
    cluster), so they are actually removed — a driver-local
    ``shutil.rmtree`` silently no-ops on those and leaks the signature
    table on shared storage (ADVICE r3 #4). Bare local paths (tempfile
    scratch dirs) delete with ``shutil`` DIRECTLY: resolving them through
    Hadoop's default filesystem would, in a local-master session whose
    fs.defaultFS points at a remote FS (e.g. an inherited
    HADOOP_CONF_DIR), target a same-named REMOTE path and leak the local
    dir (ADVICE r4 #2). An explicit scheme carries no such ambiguity.
    """

    _SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

    def __init__(self, path: str, spark=None):
        self.path = path
        self.spark = spark

    def unpersist(self, blocking: bool = False):
        import shutil

        if self._SCHEME.match(self.path) and self.spark is not None:
            try:
                jvm = self.spark._jvm
                jpath = jvm.org.apache.hadoop.fs.Path(self.path)
                fs = jpath.getFileSystem(
                    self.spark._jsc.hadoopConfiguration()
                )
                fs.delete(jpath, True)
                return
            except Exception:
                pass  # dead JVM / unreachable FS → best-effort local delete
        shutil.rmtree(re.sub(r"^file:(//)?", "", self.path), ignore_errors=True)


def release_intermediates(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate attached via ``attach_cleanup``.
    Returns the number of frames released. Safe to call twice."""
    cached = getattr(df, "_bfokg_cached", ())
    n = 0
    for frame in cached:
        try:
            frame.unpersist(blocking)
            n += 1
        except Exception:
            pass
    df._bfokg_cached = ()
    return n
