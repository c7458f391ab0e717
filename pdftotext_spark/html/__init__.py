from pdftotext_spark.html.extract import extract_main_content

__all__ = ["extract_main_content"]
