"""medical_ocr_service_ray — a Ray-Data-native extraction/data-processing engine.

A from-scratch rebuild of the data-plane capabilities of
``silviosotelo/medical-ocr-service`` (structural survey: SURVEY.md) as pure
``ray.data.Dataset`` pipelines over Arrow batches: per-turn payload
classification, routed main-content extraction (HTML boilerplate strip,
PDF/layout reading-order recovery, plain-text normalization), field
normalizers with span offsets, confidence scoring, keyed stable ordering,
dedup families, ANN search, text analysis, and checkpoint/manifest resume.
"""

__version__ = "0.1.0"

# Install the schema-hash warning filter at import time so it is active in
# EVERY process that loads this package — Ray workers install it when they
# deserialize a stage function, which is where the per-batch
# "Failed to hash the schemas (for deduplication)" noise actually fires
# (driver-side installation alone leaves worker stderr flooded).
from medical_ocr_service_ray.config import _silence_schema_hash_warning as _sshw

_sshw()
del _sshw
