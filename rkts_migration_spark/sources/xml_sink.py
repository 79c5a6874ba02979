"""Per-collection XML outline sink (K5 analog).

The reference builds each collection's export by appending ``<item>``
fragments to one in-memory string inside a sequential row loop and
writing a wrapped ``<outline>`` document per collection
(/root/reference/sqltoxml.py:27-42,140-150). That shape — one document
per collection, items in source order, text fields escaped with
``xml.sax.saxutils.escape`` — is re-expressed for Spark:

1. the ``<item>`` fragment is a pure column expression
   (``format_string`` over ``xml_escape_col``-ed fields), so fragment
   rendering is distributed and codegen'd;
2. fragments are globally sorted by (collection, ordinal) with
   ``repartitionByRange`` + ``sortWithinPartitions`` and written as
   text partitioned by collection — every part file holds a contiguous
   ordinal range, so lexicographic part-file order IS document order;
3. a driver-side *streaming* stitch concatenates each collection's
   part files between the XML header and ``</outline>`` footer with
   ``shutil.copyfileobj`` — O(1) memory regardless of document size.

A single XML document is inherently one serial byte stream, so step 3
is the irreducible sequential tail; everything upstream of it (the
expensive part: joins, escaping, formatting, sorting) scales with the
cluster. At 100 TB you would keep the partitioned fragment directory
as the queryable artifact and stitch only the collections that need a
literal ``.xml`` file.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?><outline>'
    "<name>rKTs</name><note>exported from SQL</note>"
)
XML_FOOTER = "</outline>"


def write_xml_outline(
    df: DataFrame,
    coll_col: str,
    item_col: Column,
    order_cols: list[str],
    out_dir: str,
    header: str = XML_HEADER,
    footer: str = XML_FOOTER,
    stitch: bool = True,
) -> dict[str, str]:
    """Write one ``<outline>`` XML document per distinct ``coll_col``
    value under ``out_dir`` (``<coll>.xml``), items ordered by
    ``order_cols`` within each collection. ``item_col`` must already
    be the rendered fragment (see module docstring). Returns
    {collection: path}. With ``stitch=False`` only the partitioned
    fragment directory is produced (the scale path)."""
    frag_dir = os.path.join(out_dir, "_fragments")
    (
        df.select(
            F.col(coll_col).alias("coll"),
            *[F.col(c) for c in order_cols],
            item_col.alias("value"),
        )
        .repartitionByRange("coll", *order_cols)
        .sortWithinPartitions("coll", *order_cols)
        .select("coll", "value")
        .write.mode("overwrite")
        .partitionBy("coll")
        .text(frag_dir)
    )
    if not stitch:
        return {}
    out: dict[str, str] = {}
    for entry in sorted(os.listdir(frag_dir)):
        if not entry.startswith("coll="):
            continue
        coll = entry.split("=", 1)[1]
        dst = os.path.join(out_dir, f"{coll}.xml")
        parts = sorted(
            p
            for p in os.listdir(os.path.join(frag_dir, entry))
            if p.startswith("part-")
        )
        with open(dst, "wb") as w:
            w.write(header.encode("utf-8"))
            for p in parts:
                with open(os.path.join(frag_dir, entry, p), "rb") as r:
                    # part files are newline-delimited fragments; the
                    # reference document has no separators, so strip
                    # the line breaks while streaming
                    for line in r:
                        w.write(line.rstrip(b"\n"))
            w.write(footer.encode("utf-8"))
        out[coll] = dst
    return out
