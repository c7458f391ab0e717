from pdftotext_spark.html.extract import (
    decode_html_bytes,
    extract_main_content,
    sniff_charset,
)

__all__ = ["extract_main_content", "decode_html_bytes", "sniff_charset"]
