"""comic_text_detector_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the dataflow of dmMaze/comic-text-detector
(reference at /root/reference, GPL-3.0) recast for web text: instead of a
detect→segment→group→refine pipeline over manga page pixels, the same
operator graph runs over an Iceberg/parquet table of Common-Crawl-style
pages ``documents(url, warc_ts, html, text, lang)``:

  * a vectorized Arrow UDF stage tokenizes raw HTML bytes into a DOM node
    stream and scores every node with two "heads" (block-level
    content/boilerplate classifier ~ the YOLO detection head at
    reference basemodel.py:240-244; char-density ~ the UNet/DBNet seg head),
  * thresholding + gap sessionization + merge recover the reference's
    ``group_output`` TextBlock grouping (reference utils/textblock.py:421-508),
  * a refinement/recovery pass mirrors ``refine_mask`` /
    ``refine_undetected_mask`` (reference utils/textmask.py:135-169),
  * final text assembly replicates ``TextBlock.get_text``'s
    ``' '.join(text).strip()`` semantics (reference utils/textblock.py:196-199)
    byte-identically.

Everything is DataFrame-first: built-in pyspark.sql.functions wherever the
semantics allow, ``mapInArrow``/``applyInPandas`` for the irreducibly
per-document algorithms, zero RDDs, zero per-row Python UDFs.
"""

__version__ = "0.1.0"
