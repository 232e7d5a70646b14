"""Page/file source and TTL file sink — the reference's file plumbing
(/root/reference/lib/file-helpers.js) re-expressed as DataFrame reads and
partitioned writes.

Reference behavior covered:
  * read page file, gunzip by extension     rdfa-extractor.js:64-70
    → Spark's text source picks the codec from the filename; ``wholetext``
    yields one row per file, so a page is a row (no driver loop).
  * share:// ↔ /share/ scheme swap          file-helpers.js:35,91
  * basename extraction                     file-helpers.js:16-18
  * TTL file sink + metadata registration   file-helpers.js:80-148
    → one partitioned text write for the lines; file metadata is a
    DataFrame of triples (B10 append shape), not SPARQL INSERTs.

Scale: one text write with ``partitionBy`` lays out /share/-style output
directories in a single distributed job; metadata triples are built from
the same DataFrame, so there is no per-file driver round-trip (the
reference pays ≥1 SPARQL round-trip per file, BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.functions.ntriples import encode_ntriples
from harvesting_extract_to_ttl_service_spark.schema import (
    DCT,
    NFO,
    NIE,
    OT_IRI,
    OT_LITERAL,
    XSD_DATETIME,
    XSD_INTEGER,
)

SHARE_SCHEME = "share://"


def share_to_path(uri: Column, share_root: str = "/share/") -> Column:
    """share://<id>.ttl → /share/<id>.ttl (file-helpers.js:35)."""
    return F.regexp_replace(uri, f"^{SHARE_SCHEME}", share_root)


def path_to_share(path: Column, share_root: str = "/share/") -> Column:
    """Inverse mapping (file-helpers.js:91)."""
    return F.regexp_replace(path, f"^{share_root}", SHARE_SCHEME)


def basename(path: Column) -> Column:
    """Filename without extension (file-helpers.js:16-18)."""
    return F.regexp_extract(path, r"([^/]+?)(\.[^./]*)?$", 1)


def read_pages(spark: SparkSession, path: str,
               base_url_prefix: str = "http://example.org/page/") -> DataFrame:
    """Read HTML page files (plain or .gz — codec chosen per file by
    extension, matching the reference's explicit gunzip branch) into the
    PAGE_SCHEMA shape. One file = one row via ``wholetext``."""
    raw = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("html"),
        )
    )
    return raw.select(
        path_to_share(F.col("path")).alias("page_uri"),
        F.concat(F.lit(base_url_prefix), basename(F.col("path"))).alias("url"),
        "path",
        "html",
    )


def pages_from_table(spark: SparkSession, path: str) -> DataFrame:
    """PAGE_SCHEMA rows stored as parquet (FIXTURES.md §B3)."""
    return spark.read.parquet(path)


def read_share_files(spark: SparkSession, share_dir: str,
                     share_root: str | None = None) -> DataFrame:
    """Raw physical file contents keyed by their ``share://`` uri:
    ``(physical_uri, html)``. ``share_root`` defaults to ``share_dir``
    itself so tests can point at any directory; production layouts pass
    ``/share/``. Plain or ``.gz`` per file, one file = one row."""
    share_root = share_root or (share_dir.rstrip("/") + "/")
    raw = spark.read.text(share_dir, wholetext=True)
    local_path = F.regexp_replace(F.input_file_name(), "^file:(//)?", "/")
    local_path = F.regexp_replace(local_path, "^/+", "/")
    # input_file_name() yields a percent-encoded URI path: a share file
    # named with spaces/non-ASCII would otherwise surface as %20/%C3%A9
    # and silently miss the plain share:// uris in nie:dataSource metadata
    # (resolve_page_bodies' inner join). Decode before the scheme swap —
    # protecting literal '+' first, which URI encoding leaves bare but
    # form-decoding would corrupt to a space.
    local_path = F.url_decode(F.regexp_replace(local_path, r"\+", "%2B"))
    return raw.select(
        path_to_share(local_path, share_root).alias("physical_uri"),
        F.col("value").alias("html"),
    )


def resolve_page_bodies(metadata: DataFrame, contents: DataFrame,
                        graph: str | None = None) -> DataFrame:
    """The reference's ``getFileContent`` composition
    (file-helpers.js:20-63) as one set-oriented job: for every logical
    page, find its physical file via ``nie:dataSource`` (the B1 point
    lookup, LIMIT 1 → deterministic MIN here), its original web address
    via ``nie:url`` (the B2 DISTINCT projection), and join the physical
    ``share://`` uri to the read file contents. Output is the
    ``page_bodies`` input of ``run_import_pipeline``:
    ``(page_uri, url, html)``.

    Scale: both metadata maps are control-plane-sized → broadcast to the
    contents side, which is the only heavy table; no shuffle of html."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        graph_scope,
    )

    scoped = graph_scope(metadata, graph)
    # one physical file per page (the reference's LIMIT 1)
    physical = (
        scoped.filter(F.col("predicate") == NIE + "dataSource")
        .groupBy(F.col("object_value").alias("page_uri"))
        .agg(F.min("subject").alias("physical_uri"))
    )
    urls = (
        scoped.filter(F.col("predicate") == NIE + "url")
        .groupBy(F.col("subject").alias("page_uri"))
        .agg(F.min("object_value").alias("url"))
    )
    return (
        contents.join(F.broadcast(physical), "physical_uri")
        .join(F.broadcast(urls), "page_uri", "left")
        .select("page_uri", "url", "html")
    )


def _file_id(content_hash: Column) -> Column:
    return F.concat(F.lit("http://data.lblod.info/id/files/"), content_hash)


def file_metadata_triples(files: DataFrame, graph: str | None = None) -> DataFrame:
    """Logical-file / physical-file metadata block as TRIPLE_SCHEMA rows
    (file-helpers.js:108-139): name, format, size, extension, created, and
    the nie:dataSource link physical→logical.

    Input columns: ``file_uri`` (logical id), ``filename``, ``format``,
    ``size`` (bytes), ``extension``, ``created`` (timestamp), ``source``
    (nie:url). Ids are content/caller-derived, never random (SURVEY.md §7
    hard part (d))."""
    phys = F.concat(F.lit(SHARE_SCHEME),
                    F.regexp_extract("file_uri", r"([^/]+)$", 1),
                    F.lit("."), F.col("extension"))

    def lit_t(s, p, o, ot=OT_LITERAL, dt=None):
        return F.struct(
            s.alias("subject"), F.lit(p).alias("predicate"),
            o.cast("string").alias("object_value"),
            F.lit(ot).alias("object_type"),
            F.lit(dt).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
            F.lit(graph).cast("string").alias("graph"),
        )

    lf, pf = F.col("file_uri"), phys
    created = F.date_format("created", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    parts = [
        lit_t(lf, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
              F.lit(NFO + "FileDataObject"), OT_IRI),
        lit_t(lf, NFO + "fileName", F.col("filename")),
        lit_t(lf, DCT + "format", F.col("format")),
        lit_t(lf, NFO + "fileSize", F.col("size"), OT_LITERAL, XSD_INTEGER),
        lit_t(lf, DCT + "created", created, OT_LITERAL, XSD_DATETIME),
        lit_t(lf, NIE + "url", F.col("source"), OT_IRI),
        lit_t(pf, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
              F.lit(NFO + "FileDataObject"), OT_IRI),
        lit_t(pf, NIE + "dataSource", lf, OT_IRI),
    ]
    # One explode over an 8-struct array, NOT an 8-way union: each union
    # branch would carry its own copy of the ``files`` subtree — and when
    # the input is the pipeline's spilled-content stream, that subtree
    # contains the Python extraction stage, so the union shape would run
    # the extraction once per metadata kind in the same job.
    return files.select(F.explode(F.array(*parts)).alias("t")).select("t.*")


def write_spilled_content(spilled: DataFrame, out_dir: str) -> None:
    """Write spilled oversized-content rows (``file_uri, content, …`` from
    ``spill_html_content``) as one directory per content-addressed file
    uri — the engine's share-mount layout for the reference's per-file
    ``writeFile`` (file-helpers.js:96-101). Dynamic partition overwrite
    for the same accumulate/replay semantics as the TTL sink."""
    # content-addressed: the same content reached from several sources is
    # one file — dedup before the write or the partition gets N copies
    (spilled.select(F.col("file_uri"), F.col("content")).distinct()
     .write.partitionBy("file_uri").mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .text(out_dir))


def spilled_file_metadata(spilled: DataFrame, now_iso: str,
                          graph: str | None = None) -> DataFrame:
    """Metadata-registration block for spilled content files — the
    INSERT half of ``writeFileToTriplestore`` (file-helpers.js:103-148)
    as TRIPLE_SCHEMA rows via :func:`file_metadata_triples`. ``created``
    is the caller's deterministic pipeline timestamp, never wall-clock."""
    files = spilled.select(
        "file_uri",
        F.col("name").alias("filename"),
        F.col("content_type").alias("format"),
        F.octet_length(F.encode("content", "UTF-8")).cast("long").alias("size"),
        "extension",
        F.to_timestamp(F.lit(now_iso.replace("Z", ""))).alias("created"),
        "source",
    )
    return file_metadata_triples(files, graph)


def write_ttl(triples: DataFrame, out_dir: str,
              partition_cols: tuple[str, ...] = ("page_uri",),
              turtle_prefixes: dict[str, str] | None = None) -> None:
    """Write triple rows as N-Triples text partitioned by page/task
    (file-helpers.js:80-97's per-page .ttl files → one distributed
    partitioned write). DYNAMIC partition overwrite: only the partitions
    present in this batch are replaced — a later service micro-batch
    must not wipe earlier batches' trees, and a checkpoint replay of the
    same batch rewrites exactly its own partitions (idempotent).

    ``turtle_prefixes``: emit prefix-compacted Turtle statements instead
    of N-Triples lines (functions/ntriples.py ``encode_turtle``), with
    the matching ``@prefix`` block written once as ``_prefixes.ttl`` at
    the tree root (per-part headers would be wrong: parts of one
    partition concatenate into one logical document). Default None keeps
    reference-parity N-Triples output."""
    if turtle_prefixes is None:
        lines = encode_ntriples(triples).select(*partition_cols, "nt")
    else:
        from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
            encode_turtle,
        )

        # verify-or-write the root header BEFORE the data write: a batch
        # whose prefix map disagrees with the tree's existing header must
        # fail without touching any partition — raising after the dynamic
        # overwrite would leave partitions encoded under the NEW map in a
        # tree whose header still declares the OLD one.
        _write_prefix_header(triples.sparkSession, out_dir, turtle_prefixes)
        lines = encode_turtle(triples, turtle_prefixes).select(
            *partition_cols, "ttl")
    (lines
       .write.partitionBy(*partition_cols).mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .text(out_dir))


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf —
    works for any scheme the cluster knows (file://, hdfs://, s3a://),
    not just the driver's local filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _write_prefix_header(spark: SparkSession, out_dir: str,
                         prefixes: dict[str, str]) -> None:
    """Write (or verify) the tree-root ``_prefixes.ttl`` header through the
    Hadoop FileSystem API — the data write above goes through the
    Hadoop-aware Spark writer, so a plain local ``open()`` here would
    succeed for the partitions then fail (or worse, write somewhere else)
    for an hdfs://-style ``out_dir``.

    A tree has ONE header interpreting every partition's prefixed names,
    accumulated across micro-batches — so a later batch with a DIFFERENT
    prefix map must not silently overwrite it (that would re-interpret
    earlier partitions' statements). Identical header → no-op; different →
    ValueError telling the caller to compact/rewrite the tree instead."""
    from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
        turtle_prefix_header,
    )

    header = turtle_prefix_header(prefixes) + "\n"
    fs, root = _hadoop_fs(spark, out_dir)
    hpath = root.suffix("/_prefixes.ttl")
    if fs.exists(hpath):
        # bounded read: the header is a few lines of @prefix declarations.
        # NOT spark.read.text — the data-source path filter treats
        # underscore-prefixed files as hidden and returns nothing.
        stream = fs.open(hpath)
        try:
            existing = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()
        if existing.rstrip("\n") == header.rstrip("\n"):
            return
        raise ValueError(
            f"{hpath}: existing @prefix header disagrees with this "
            f"batch's turtle_prefixes — earlier partitions were encoded "
            f"under the old map, so silently replacing the header would "
            f"re-interpret their prefixed names. Use the same prefix map "
            f"for every batch of one tree, or compact/re-encode the tree "
            f"to a new root with the new map.")
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(header.encode("utf-8")))
    finally:
        out.close()


def compact_ttl_tree(spark, src_dir: str, dst_dir: str,
                     partition_cols: tuple[str, ...] = ("page_uri",)) -> dict:
    """Compact a partitioned TTL tree (the ``write_ttl`` layout) into one
    file per partition directory — the small-files answer for a tree that
    accumulated many part files across service micro-batches (each
    dynamic-overwrite batch adds its own parts; at 100 TB the file count,
    not the byte count, is what kills the namenode/listing and downstream
    scan planning).

    One shuffle keyed on the partition columns puts every partition
    value's lines in one task, so the partitioned rewrite emits exactly
    one part file per directory. Line order within a partition is not
    contractual (N-Triples/Turtle statements are set-semantics; the
    in-partition order already depends on batch arrival), and the writer
    never reads and writes the same directory — compact to a NEW root and
    swap atomically at the catalog/symlink level.

    A Turtle-mode tree's ``_prefixes.ttl`` root header is copied to the
    new root (prefixed-name statements without their ``@prefix`` block
    would be a different document). All file I/O goes through the Hadoop
    FileSystem API, so src/dst may live on any scheme the cluster mounts
    (file://, hdfs://, s3a://), same as the data write itself.

    Returns ``{"files_before": n, "files_after": m, "rows": k}``."""
    from pyspark.sql import functions as _F

    df = spark.read.text(src_dir)  # partition discovery recovers the cols
    for c in partition_cols:
        if c not in df.columns:
            raise ValueError(f"{src_dir} has no partition column {c!r}")
    rows = df.count()

    def n_parts(root_dir: str) -> int:
        # the write_ttl layout is exactly one directory level per
        # partition column, so a fixed-depth Hadoop glob (no '**', which
        # Hadoop globs don't support) enumerates every part file
        fs, _ = _hadoop_fs(spark, root_dir)
        pattern = "/".join([root_dir.rstrip("/")]
                           + ["*"] * len(partition_cols) + ["part-*"])
        jvm = spark._jvm
        matches = fs.globStatus(jvm.org.apache.hadoop.fs.Path(pattern))
        return len(matches) if matches is not None else 0

    before = n_parts(src_dir)
    (df.repartition(*[_F.col(c) for c in partition_cols])
       .write.partitionBy(*partition_cols).mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .text(dst_dir))
    src_fs, src_root = _hadoop_fs(spark, src_dir)
    src_hdr = src_root.suffix("/_prefixes.ttl")
    if src_fs.exists(src_hdr):
        dst_fs, dst_root = _hadoop_fs(spark, dst_dir)
        spark._jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, src_hdr, dst_fs, dst_root.suffix("/_prefixes.ttl"),
            False, True, spark._jsc.hadoopConfiguration())
    after = n_parts(dst_dir)
    return {"files_before": before, "files_after": after, "rows": rows}
