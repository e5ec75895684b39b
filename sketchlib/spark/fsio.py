"""Small-file driver-side writes through the session's Hadoop FileSystem.

Production jobs take an --output that is usually NOT a local path
(hdfs://, s3a://, gs://...). ``open()``/``os.makedirs`` only speak the
driver's local disk: ``open("s3a://bucket/run/metrics.json", "w")``
silently creates a literal local directory named ``s3a:`` and the
artifact never reaches the object store even though the job exits 0.
Every sidecar artifact (merged sketch blobs, metrics.json) therefore
goes through the same Hadoop FileSystem API Spark's own writers use —
one code path for file:///hdfs:///s3a:// alike.

Data-scale outputs still use ``df.write.parquet`` (distributed); these
helpers are for KB-scale driver-side artifacts only.
"""

from __future__ import annotations


def _fs_path(spark, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p


def write_bytes(spark, path: str, data: bytes) -> None:
    """Create/overwrite ``path`` with ``data`` via the Hadoop FS.
    Parent directories are created implicitly (FileSystem.create
    semantics, same as Spark's own committers)."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def write_text(spark, path: str, text: str) -> None:
    write_bytes(spark, path, text.encode())


def read_bytes(spark, path: str) -> bytes:
    """Read a small file back through the Hadoop FS (round-trip tests,
    resuming jobs that persisted driver-side state). Uses commons-io
    (ships with Hadoop) to collect the stream JVM-side: py4j passes a
    Python bytearray into byte[] args BY COPY, so Java-side readFully
    mutations would never reach Python."""
    fs, p = _fs_path(spark, path)
    jvm = spark.sparkContext._jvm
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
