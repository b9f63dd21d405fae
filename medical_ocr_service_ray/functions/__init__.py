"""Pure, deterministic extraction functions.

Everything in this package is plain Python with zero Ray dependencies so the
same code powers (a) the single-process oracle used as the correctness golden
and (b) the vectorized / actor-pool Ray stages. Determinism rules: no
wall-clock, no randomness, no float ops whose order depends on parallelism.
"""

from medical_ocr_service_ray.functions.classify import classify_content_type
from medical_ocr_service_ray.functions.extractor import extract_turn

__all__ = ["classify_content_type", "extract_turn"]
