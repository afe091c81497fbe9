"""Shared Hadoop FileSystem access — ONE copy of the py4j plumbing.

Every path the engine touches (file://, hdfs://, s3a://) resolves through
the same FileSystem abstraction Spark's own readers use, so preflight
checks, compaction swaps and store probes all see exactly what a
subsequent job will see. Centralized here because the pattern had grown
independent copies in cli.py, operators/etl.py and streaming/pipeline.py
— each of which had to stay individually correct about configuration
plumbing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for any Hadoop-supported scheme."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


CURATE_MARKER = "_curate_owned"
# the first marker scheme lived INSIDE the partition dir; stores marked
# by it are still recognized (dual read below), never written anew
LEGACY_CURATE_MARKER = "_curate_batch"


def _marker_jpath(spark, store: str, batch_id: int, marker: str):
    # STORE-ROOT file, not a file inside the partition dir: dynamic
    # partition overwrite deletes the partition's contents, so an
    # in-partition marker vanishes during every curate replay and a
    # crash before the re-stamp would leave committed curate rows
    # unmarked — exactly the unguarded state the marker exists to
    # prevent (review r5). Root-level ``_``-files survive any partition
    # write and stay invisible to parquet readers.
    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(
        f"{store.rstrip('/')}/{marker}_{batch_id}"
    )


def partition_has_marker(
    spark: SparkSession, store: str, batch_id: int, marker: str = CURATE_MARKER
) -> bool:
    """True iff ``batch_id=<n>`` carries the named ownership marker (a
    ``_``-prefixed store-root file, invisible to every parquet reader).
    Ownership markers make the shared batch_id store layout safe for
    TWO writers — the streaming ingest (unmarked partitions) and
    ``curate_corpus`` (marked) — by letting each side refuse to
    dynamic-overwrite the other's committed history (review r5). A
    store marked by the first, in-partition scheme is still recognized
    so an existing store's protection survives the relocation."""
    fs, _ = hadoop_fs(spark, store)
    if fs.exists(_marker_jpath(spark, store, batch_id, marker)):
        return True
    jvm = spark._jvm
    return bool(
        fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                f"{store.rstrip('/')}/batch_id={batch_id}/"
                f"{LEGACY_CURATE_MARKER}"
            )
        )
    )


def touch_partition_marker(
    spark: SparkSession, store: str, batch_id: int, marker: str = CURATE_MARKER
) -> None:
    """Stamp the ownership marker. Callers stamp BEFORE writing data
    (claim-first): the marker survives the write and any crash, so
    there is no window in which committed rows sit unmarked."""
    fs, _ = hadoop_fs(spark, store)
    fs.create(_marker_jpath(spark, store, batch_id, marker), True).close()


def remove_partition_marker(
    spark: SparkSession, store: str, batch_id: int, marker: str = CURATE_MARKER
) -> None:
    """Retire an ownership marker (idempotent; absent is fine). One
    module owns the marker path scheme — callers never build paths."""
    fs, _ = hadoop_fs(spark, store)
    fs.delete(_marker_jpath(spark, store, batch_id, marker), False)


def list_partition_markers(
    spark: SparkSession, store: str, marker: str = CURATE_MARKER
) -> set[int]:
    """Batch ids carrying a store-root ownership marker."""
    fs, root = hadoop_fs(spark, store)
    if not fs.exists(root):
        return set()
    out: set[int] = set()
    prefix = f"{marker}_"
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(prefix):
            try:
                out.add(int(name[len(prefix):]))
            except ValueError:
                continue
    return out


def write_json_sidecar(
    spark: SparkSession, dir_path: str, name: str, obj: dict
) -> None:
    """Write a small ``_``-prefixed JSON sidecar at a store root —
    invisible to every parquet reader (same family as the ownership
    markers), durable across partition appends, resolved through the
    same FileSystem abstraction as the data so it works on any
    Hadoop-supported scheme. Overwrites an existing sidecar of the same
    name. Used for index metadata (e.g. the IVF-PQ residual/dims/m
    contract) that MUST travel with the artifact rather than rely on
    every caller re-passing the build-time flags correctly."""
    import json

    fs, _ = hadoop_fs(spark, dir_path)
    jvm = spark._jvm
    root = dir_path.rstrip("/")
    p = jvm.org.apache.hadoop.fs.Path(f"{root}/{name}")
    # write-to-temp + rename (review r8): fs.create(p, true) truncates
    # in place, so a crash mid-write — or a concurrent reader racing the
    # stamp — would surface as an opaque JSONDecodeError on every later
    # probe instead of the recoverable missing-sidecar path. The rename
    # is atomic on HDFS/local; on S3A it is copy+delete, but the copy
    # only becomes visible complete, which keeps readers safe there too.
    tmp = jvm.org.apache.hadoop.fs.Path(f"{root}/.{name}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(
            f"write_json_sidecar: rename {tmp} -> {p} failed"
        )


def read_json_sidecar(
    spark: SparkSession, dir_path: str, name: str
) -> dict | None:
    """Parse a sidecar written by :func:`write_json_sidecar`; ``None``
    if absent (e.g. an index built before the sidecar scheme existed)."""
    import json

    fs, _ = hadoop_fs(spark, dir_path)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{dir_path.rstrip('/')}/{name}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; a py4j bytearray argument would
        # be copied INTO the JVM (readFully's mutation would be lost),
        # so read through a JVM-side helper that RETURNS the bytes
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    try:
        return json.loads(bytes(data).decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        # a truncated/corrupt sidecar (pre-rename-era writer crash, or
        # out-of-band damage) should surface as the documented
        # recoverable contract, not an opaque JSONDecodeError
        raise ValueError(
            f"corrupt JSON sidecar {dir_path.rstrip('/')}/{name} "
            f"({e}); delete it and re-stamp (e.g. "
            "operators.similarity.stamp_ivfpq_meta for IVF-PQ stores) "
            "to recover"
        ) from e


def has_data_files(spark: SparkSession, path_str: str) -> bool:
    """True iff the directory holds at least one COMMITTED data file
    (recursively; underscore/dot-prefixed names — _SUCCESS, _temporary,
    .spark-staging — don't count).

    The distinction matters for store-probing: a dir can EXIST while
    holding no data (an empty first write leaves only _SUCCESS; a crashed
    first attempt leaves staging debris), and `spark.read.parquet` on such
    a dir throws "Unable to infer schema" — which must read as "empty
    store", not as a permanent failure."""
    fs, jpath = hadoop_fs(spark, path_str)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        p = it.next().getPath()
        if p.getName().startswith(("_", ".")):
            continue
        # any ancestor dir under a hidden segment is hidden too
        parts = p.toString().split("/")
        if any(seg.startswith(("_", ".")) for seg in parts[:-1] if seg):
            # scheme://host segments never start with _ or .; partition
            # dirs like part=1 don't either — only markers/staging do
            continue
        return True
    return False
