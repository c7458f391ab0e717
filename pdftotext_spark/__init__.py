"""pdftotext_spark — a PySpark-native extraction engine.

A from-scratch reimplementation of the *capabilities* of the reference
PHP library ``pmdunggh/pdftotext`` (``/root/reference/PdfToText.php``),
re-expressed Spark-first:

- a pure-Python, dependency-free PDF text-extraction core
  (:mod:`pdftotext_spark.core`) exercised per Arrow batch inside
  vectorized pandas UDFs — never per-row Python;
- an HTML boilerplate-stripping branch (:mod:`pdftotext_spark.html`)
  using DOM text/link-density heuristics (new work; the reference has
  no HTML path — see SURVEY.md §0);
- DataFrame-level operators (:mod:`pdftotext_spark.operators`) for
  dedup, similarity search, text analysis, sessionization and capture
  semantics, all expressed with built-in ``pyspark.sql.functions`` so
  Catalyst/Tungsten handle pushdown, pruning and codegen;
- batch and streaming pipelines (:mod:`pdftotext_spark.plans`,
  :mod:`pdftotext_spark.streaming`) over transcripts tables
  ``(conv_id, turn_idx, role, text, tool, ts)``.
"""

__version__ = "0.1.0"
