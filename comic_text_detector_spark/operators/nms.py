"""J2 greedy NMS (reference utils/yolov5_utils.py:124-218).

Greedy conf-ordered suppression is inherently sequential per group, so it
runs as a grouped-map pandas UDF keyed by the document/group column — the
candidate sets are per-document (≤ max_det-scale), so each group is tiny and
the only shuffle is the group key. The IoU matrix inside is vectorized
numpy, mirroring the reference's batched box_iou (:100-122).

The reference's resource caps are applied relationally BEFORE the UDF:
per-group conf-ordered truncation to ``max_nms`` (reference 30000,
:196-197) via a window — never a global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NMS_IOU_THRES = 0.35  # reference inference.py:139
MAX_NMS = 30000  # reference utils/yolov5_utils.py:143-146
MAX_DET = 300  # reference utils/yolov5_utils.py:203-204


def _greedy_keep(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray,
    conf: np.ndarray, cls: np.ndarray, ids: np.ndarray,
    iou_thres: float, max_det: int,
) -> np.ndarray:
    """Vectorized greedy NMS; returns kept ids in conf-desc order.

    Candidates are pre-sorted conf desc (ties: id asc — the reference's
    stable index order). The class-offset trick (:200-202) is replaced by an
    explicit same-class test in the suppression mask.
    """
    order = np.lexsort((ids, -conf))
    x1, y1, x2, y2 = x1[order], y1[order], x2[order], y2[order]
    cls, ids = cls[order], ids[order]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    alive = np.ones(len(ids), dtype=bool)
    kept: list[int] = []
    for i in range(len(ids)):
        if not alive[i]:
            continue
        kept.append(ids[i])
        if len(kept) >= max_det:
            break
        iw = np.minimum(x2[i], x2) - np.maximum(x1[i], x1)
        ih = np.minimum(y2[i], y2) - np.maximum(y1[i], y1)
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        alive &= ~((iou > iou_thres) & (cls == cls[i]))
        alive[i] = False
    return np.asarray(kept)


def nms_boxes(
    boxes: DataFrame,
    group_col: str = "url",
    id_col: str = "box_id",
    conf_thres: float = 0.4,
    iou_thres: float = NMS_IOU_THRES,
    max_nms: int = MAX_NMS,
    max_det: int = MAX_DET,
) -> DataFrame:
    """boxes(group, box_id, x1, y1, x2, y2, conf, cls) → surviving boxes.

    Plan shape: P1 conf filter (pushed to the scan) → W4 per-group top-max_nms
    window → grouped pandas NMS → survivors.
    """
    filtered = boxes.filter(F.col("conf") > conf_thres)
    w = Window.partitionBy(group_col).orderBy(
        F.col("conf").desc(), F.col(id_col).asc()
    )
    capped = (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_nms)
        .drop("__rn")
    )
    schema = capped.schema

    def nms_group(pdf: pd.DataFrame) -> pd.DataFrame:
        kept = _greedy_keep(
            pdf["x1"].to_numpy(float),
            pdf["y1"].to_numpy(float),
            pdf["x2"].to_numpy(float),
            pdf["y2"].to_numpy(float),
            pdf["conf"].to_numpy(float),
            pdf["cls"].to_numpy(),
            pdf[id_col].to_numpy(),
            iou_thres,
            max_det,
        )
        out = pdf.set_index(id_col).loc[kept].reset_index()
        return out[list(pdf.columns)]

    return capped.groupBy(group_col).applyInPandas(nms_group, schema)


def nms_spans(
    spans: DataFrame,
    group_col: str = "url",
    id_col: str = "span_id",
    conf_thres: float = 0.4,
    iou_thres: float = NMS_IOU_THRES,
    max_det: int = MAX_DET,
) -> DataFrame:
    """1-D variant for text spans: spans(group, span_id, char_start,
    char_end, conf, cls) — the webtext recast of box NMS."""
    zero = F.lit(0.0)
    boxes = spans.select(
        group_col,
        F.col(id_col).alias("box_id"),
        F.col("char_start").cast("double").alias("x1"),
        zero.alias("y1"),
        F.col("char_end").cast("double").alias("x2"),
        F.lit(1.0).alias("y2"),
        "conf",
        "cls",
    )
    out = nms_boxes(
        boxes, group_col, "box_id", conf_thres, iou_thres, max_det=max_det
    )
    return out.select(
        group_col,
        F.col("box_id").alias(id_col),
        F.col("x1").cast("int").alias("char_start"),
        F.col("x2").cast("int").alias("char_end"),
        "conf",
        "cls",
    )
