"""Sinks (SURVEY.md §2.1 S3-S7).

The reference fans one compute out to four per-image files (yolo labels,
line polys, JSON blocks, mask PNG — inference.py:43-70); the engine's
canonical sinks are parquet/Iceberg tables, with the text/JSON formats kept
as column expressions so the byte format is testable without I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_extracted(df: DataFrame, path: str, mode: str = "append") -> None:
    """S3: the canonical sink (Iceberg writeTo(...).append() in prod)."""
    df.write.mode(mode).parquet(path)


def yolo_label_lines(
    cls: Column, cx: Column, cy: Column, w: Column, h: Column
) -> Column:
    """S4 yolo-label text format: 'cls cx cy w h' per box (reference
    get_yololabel_strings, utils/imgproc_utils.py:22-28). Coordinates are
    emitted with 6 fractional digits like np.savetxt's default-ish contract;
    format_string is JVM-side printf."""
    return F.format_string("%d %.6f %.6f %.6f %.6f", cls, cx, cy, w, h)


def line_poly_rows(pts: Column) -> Column:
    """S5 line-polygon text sink: n x 8 ints space-joined (inference.py:61-65
    flattens (n,4,2) to 8-tuples)."""
    return F.array_join(
        F.transform(F.flatten(pts), lambda v: v.cast("int").cast("string")), " "
    )


def blocks_json(blocks_struct: Column) -> Column:
    """S6 JSON blocks sink: to_json of the block struct array (reference
    json.dumps(blk_dict_list, cls=NumpyEncoder), inference.py:66-68)."""
    return F.to_json(blocks_struct)


def write_labels_text(df: DataFrame, line_col: str, path: str) -> None:
    """Group lines per url and write one text row per document
    (concat_ws('\n', collect_list(...)) — the F8 assembly)."""
    df.select(F.col(line_col).alias("value")).write.mode("overwrite").text(path)
