"""OP-SRC-XML — distributed OSM-XML scan (SURVEY.md §2.1).

Reference: ``get_element`` streams one file with cElementTree.iterparse,
yielding node/way/relation elements on their end events and clearing the
consumed subtree to bound memory (Step_2_CSV_and_Data_Cleaning.py:191-199;
start-event audit variant Step_1_Audit_Values.py:55).

Engine: a pure-PySpark source (no spark-xml dependency): files are listed
driver-side, parallelized BY FILE to executors, and each file is parsed
incrementally with ``iterparse`` inside ``mapPartitions`` — the same
bounded-memory property as the reference (elem.clear() after yield), but
N files parse in parallel.

Scale posture (SURVEY.md §7 hard-point 2): raw XML has no record
delimiter, so a naive byte split risks cutting an element in half. The
scan is still made splittable the way Hadoop's XmlInputFormat splits
text: each byte range SYNCS forward to the first top-level element start
(``<node``/``<way``/``<relation`` + delimiter) at-or-after its start
offset, and parses every element whose start lies in ``[start, end)`` —
reading past ``end`` to finish the element that straddles the boundary.
An element belongs to exactly the split containing its first byte, so a
multi-split read is row-identical to a one-task read. This is sound
because ``<`` cannot appear unescaped inside XML attribute values and
OSM top-level kinds never nest (children are only tag/nd/member); the
one documented blind spot is a ``<node`` inside an XML comment, which
real OSM dumps don't produce. Compressed inputs (.gz/.bz2) are not
byte-addressable and keep one task per file. For repeated passes at
100 TB the right move is still a ONE-TIME conversion to a partitioned
parquet landing zone (``to_landing_zone``): column pruning, predicate
pushdown, and split-level parallelism for free on every later read.

Yielded schema (one row per element, FIXTURES.md §2 `raw_elements`):
    element   string  'node' | 'way' | 'relation'
    id, uid, changeset   long
    lat, lon  double (null for ways/relations)
    user, version, timestamp   string
    tags      array<struct<k string, v string>>
    nds       array<long>   (ordered <nd ref> ids; empty for nodes)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("element", T.StringType(), False),
        T.StructField("id", T.LongType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("uid", T.LongType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("changeset", T.LongType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("k", T.StringType(), True),
                        T.StructField("v", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("nds", T.ArrayType(T.LongType()), True),
    ]
)

_KEPT_TAGS = ("node", "way", "relation")

#: top-level element opens — the ONLY places these byte patterns can
#: occur outside a comment (children are tag/nd/member; '<' is illegal
#: unescaped in attribute values), so they are safe split-sync points
_SYNC_RE = re.compile(rb"<(?:node|way|relation)[ \t\r\n/>]")
#: cut points for a split's tail: the next element (first byte of the
#: following split) or the document close
_CUT_RE = re.compile(rb"<(?:node|way|relation)[ \t\r\n/>]|</osm")


def _element_row(elem: "ET.Element") -> tuple:
    """One output tuple (RAW_ELEMENT_SCHEMA order) from a parsed element."""
    a = elem.attrib
    opt_long = lambda v: int(v) if v is not None else None  # noqa: E731
    tag_children = [
        (c.attrib.get("k"), c.attrib.get("v")) for c in elem if c.tag == "tag"
    ]
    nd_children = [
        int(c.attrib["ref"]) for c in elem if c.tag == "nd" and "ref" in c.attrib
    ]
    lat, lon = a.get("lat"), a.get("lon")
    return (
        elem.tag,
        opt_long(a.get("id")),
        float(lat) if lat is not None else None,
        float(lon) if lon is not None else None,
        a.get("user"),
        opt_long(a.get("uid")),
        a.get("version"),
        opt_long(a.get("changeset")),
        a.get("timestamp"),
        tag_children,
        nd_children,
    )


def _open_maybe_compressed(path: str):
    """Streaming-decompressed file object for the whole-file parse path.
    gzip/bz2/xz stream via stdlib; .zst raises with the workaround (no
    stdlib zstd codec) instead of feeding compressed bytes to the XML
    parser — the round-6 find: the 'compressed files parse as one task'
    claim had never been exercised and the parser got raw gzip bytes."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, "rb")
    if path.endswith(".xz"):
        import lzma

        return lzma.open(path, "rb")
    if path.endswith(".zst"):
        raise NotImplementedError(
            "zstd-compressed XML needs the 'zstandard' package (no "
            "stdlib codec) — decompress the file first or convert via "
            "to_landing_zone() from the decompressed form"
        )
    return open(path, "rb")


def _parse_file(path: str, tags: tuple[str, ...]) -> Iterator[tuple]:
    """Incremental single-file parse: constant memory via elem.clear()
    after each yielded element (the engine's root.clear() equivalent).
    Compressed inputs decompress as a stream — constant memory either
    way."""
    # capture the root so it can be cleared per yielded element:
    # elem.clear() alone empties each element but the root keeps
    # appending child references, growing memory linearly with file size
    # (the reference's root.clear() at S2:199 exists for exactly this)
    with _open_maybe_compressed(path) as f:
        context = ET.iterparse(f, events=("start", "end"))
        try:
            _, root = next(context)
        except StopIteration:
            return
        for event, elem in context:
            if event != "end" or elem.tag not in tags:
                continue
            yield _element_row(elem)
            root.clear()


def _scan_forward(f, from_off: int, pattern, chunk: int = 1 << 20) -> int | None:
    """File offset of the first ``pattern`` match at-or-after ``from_off``
    (or None). Streams in chunks, keeping a 16-byte tail so a token
    straddling a chunk boundary is still seen."""
    f.seek(from_off)
    pos = from_off  # file offset of buf[0]
    tail = b""
    while True:
        data = f.read(chunk)
        if not data:
            return None
        buf = tail + data
        m = pattern.search(buf)
        if m:
            return pos + m.start()
        keep = min(len(buf), 16)
        tail = buf[-keep:]
        pos += len(buf) - keep


def _parse_byte_range(
    path: str, start: int, end: int, tags: tuple[str, ...]
) -> Iterator[tuple]:
    """Parse the top-level elements whose first byte lies in [start, end).

    Sync: first element start at-or-after ``start`` (an element cut by
    the range boundary has its first byte in the PREVIOUS range, which
    reads past its own ``end`` to finish it — each element is emitted by
    exactly one split). The byte stream from sync to cut (next element
    start at-or-after ``end``, or ``</osm>``, or EOF) is fed to an
    XMLPullParser under a synthetic ``<osm>`` root; memory stays bounded
    by root.clear() per emitted element, exactly like the whole-file
    iterparse path."""
    with open(path, "rb") as f:
        sync = _scan_forward(f, start, _SYNC_RE)
        if sync is None or sync >= end:
            return
        cut = _scan_forward(f, end, _CUT_RE)
        if cut is None:
            # no element start and no doc close AFTER the range — this
            # is the document's tail split, so ``</osm>`` lies inside
            # [sync, end); find it so the stream stops before it (our
            # synthetic root supplies its own close). The close tag sits
            # at the file tail by construction, so search a bounded
            # back-window first instead of re-streaming the whole split
            # (the full forward scan doubled the tail split's I/O —
            # round-5 review find); fall back to the full scan only if
            # the window misses (e.g. kilobytes of trailing junk).
            f.seek(0, 2)
            size = f.tell()
            window = max(sync, size - 65536)
            cut = _scan_forward(f, window, re.compile(rb"</osm"))
            if cut is None:
                cut = _scan_forward(f, sync, re.compile(rb"</osm"))

        parser = ET.XMLPullParser(events=("start", "end"))
        parser.feed(b"<osm>")
        root = None

        def drain() -> Iterator[tuple]:
            nonlocal root
            for event, elem in parser.read_events():
                if event == "start":
                    if root is None:
                        root = elem  # the synthetic document root
                    continue
                if elem.tag in tags and elem is not root:
                    yield _element_row(elem)
                    root.clear()

        f.seek(sync)
        remaining = None if cut is None else cut - sync
        while remaining is None or remaining > 0:
            step = (1 << 20) if remaining is None else min(1 << 20, remaining)
            data = f.read(step)
            if not data:
                break
            if remaining is not None:
                remaining -= len(data)
            parser.feed(data)
            yield from drain()
        parser.feed(b"</osm>")
        yield from drain()


def read_osm_xml(
    spark: SparkSession,
    paths: str | list[str],
    tags: tuple[str, ...] = _KEPT_TAGS,
    *,
    split_bytes: int = 64 << 20,
) -> DataFrame:
    """Distributed OSM-XML read: one task per byte-range split.

    Small files get one task each; a file larger than ``split_bytes``
    fans out into ``ceil(size / split_bytes)`` boundary-synced range
    tasks (see module docstring) — so ONE huge ``planet.osm`` no longer
    parses in a single task. Compressed files (not byte-addressable)
    keep the whole-file iterparse path with streaming decompression
    (.gz/.bz2/.xz stdlib; .zst raises — no stdlib codec) and a read-time
    warning when their size warrants splitting; non-standard ``tags``
    sets (sync tokens cover only node/way/relation) also stay
    whole-file.

    ``tags`` filters element kinds at the parser (OP-FLT-TAGKIND — the
    reference's ``tags=('node','way')`` call, S2:320, excludes relations
    before any shaping)."""
    import glob as _glob
    import os

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) if any(c in paths for c in "*?[") else [paths]
    paths = [os.path.abspath(p) for p in paths]
    if not paths:
        raise FileNotFoundError("no OSM files matched")

    splittable = set(tags) <= set(_KEPT_TAGS)
    # non-splittable codecs cap parallelism at one task per file — warn
    # AT READ TIME (round-5 verdict residual gap 4: a docstring note is
    # invisible to the user whose gzipped extract silently parses on one
    # core), with the actionable fixes in the message
    compressed = [
        p for p in paths
        if p.endswith((".gz", ".bz2", ".zst", ".xz"))
        and os.path.getsize(p) > split_bytes
    ]
    if compressed:
        import warnings

        warnings.warn(
            f"{len(compressed)} compressed XML file(s) exceed the "
            f"{split_bytes}-byte split size but use a non-splittable "
            "codec — each parses as ONE task regardless of size "
            f"(first: {os.path.basename(compressed[0])}). For parallel "
            "ingest, decompress first or convert once via "
            "to_landing_zone() and read the parquet landing zone.",
            stacklevel=2,
        )
    # (path, start, end) with end=None meaning whole-file iterparse
    tasks: list[tuple[str, int, int | None]] = []
    for p in paths:
        size = os.path.getsize(p)
        if (
            not splittable
            or p.endswith((".gz", ".bz2", ".zst", ".xz"))
            or size <= split_bytes
        ):
            tasks.append((p, 0, None))
            continue
        n = -(-size // split_bytes)
        bounds = [size * i // n for i in range(n + 1)]
        tasks.extend(
            (p, bounds[i], bounds[i + 1]) for i in range(n)
        )

    sc = spark.sparkContext
    tasks_rdd = sc.parallelize(tasks, numSlices=len(tasks))
    rows = tasks_rdd.flatMap(
        lambda t: _parse_file(t[0], tags)
        if t[2] is None
        else _parse_byte_range(t[0], t[1], t[2], tags)
    )
    return spark.createDataFrame(rows, RAW_ELEMENT_SCHEMA)


def to_landing_zone(
    spark: SparkSession,
    xml_paths: str | list[str],
    out_dir: str,
    partition_by: str = "element",
) -> None:
    """One-time XML → partitioned-parquet conversion. Downstream passes
    read the landing zone (splittable, column-pruned, predicate-pushed)
    instead of re-parsing XML — the 100 TB ingest pattern."""
    raw = read_osm_xml(spark, xml_paths)
    raw.write.mode("overwrite").partitionBy(partition_by).parquet(out_dir)
