"""Pure-Python extraction kernels (no Spark imports).

These are the deterministic replacement for the reference's remote-LLM
extraction call (``ocr_backend/app/utils/gemini_ocr.py:156-258``): a pure
function of the payload bytes, so output is byte-identical across runs and
cluster sizes (north rule).
"""

from ocr_platform_spark.kernels.html_extract import extract_html
from ocr_platform_spark.kernels.pdf_extract import extract_pdf
from ocr_platform_spark.kernels.dispatch import extract_payload, sniff_payload_kind

__all__ = ["extract_html", "extract_pdf", "extract_payload", "sniff_payload_kind"]
