"""pdf_drawing_ocr_recognition_spark — a PySpark-native document-extraction engine.

A from-scratch re-expression of the capabilities of the reference repo
``Water-Run/pdf-drawing-ocr-recognition`` ("pdor", a single-threaded pure-Python
PDF-drawing OCR pipeline) as an idiomatic ``pyspark.sql`` DataFrame engine over
Common-Crawl-style page tables, per SURVEY.md.

Layout:

- ``kernel/``     pure-Python extraction semantics (no Spark imports) — the oracle.
  Every byte-level behavior of the reference (crop arithmetic, literal parsing,
  merge fold, serializers) lives here exactly once; the Spark layer only
  batches/schedules these kernels through Arrow UDFs.
- ``fixtures/``   deterministic corpus + pattern-dimension generators (seed=42).
- ``sources/``    readers (pages table, pattern registry).
- ``functions/``  pure Column-expression builders (crop math, brace rules,
  text-quality features, dedup hashes, vector similarity).
- ``operators/``  Spark pipeline stages (extract, assemble, skew, manifest, metrics).
- ``plans/``      end-to-end pipeline composition + SparkSession config.
- ``streaming/``  optional Structured Streaming variants.

No code is copied from the reference; semantics are cited as file:line in
docstrings so parity is checkable.
"""

__version__ = "0.1.0"
