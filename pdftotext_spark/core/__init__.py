"""Pure-Python PDF extraction core (no Spark imports).

Implements the semantics inventoried in SURVEY.md §2 from the reference
``/root/reference/PdfToText.php``; every module docstring cites the
reference spans it mirrors. The whole core is exercised per payload
inside Arrow-vectorized pandas UDFs (see
:mod:`pdftotext_spark.functions.extract`), so it must stay pure Python
with only stdlib + optional numpy.
"""

from pdftotext_spark.core.document import ExtractResult, extract_document
from pdftotext_spark.core.dispatch import extract_payload, sniff_kind

__all__ = ["ExtractResult", "extract_document", "extract_payload", "sniff_kind"]
