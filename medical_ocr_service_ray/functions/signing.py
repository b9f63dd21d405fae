"""HMAC-SHA256 signing (reference §2.8: webhook payload signatures,
src/services/webhook.service.js:63,116). In the data plane the outward-facing
record is the manifest line, so the optional integrity signature lives there:
sign the canonical JSON of each entry, verify on load."""

from __future__ import annotations

import hashlib
import hmac
import json


def sign_payload(secret: str, payload: dict) -> str:
    canonical = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hmac.new(secret.encode(), canonical.encode(), hashlib.sha256).hexdigest()


def verify_payload(secret: str, payload: dict, signature: str) -> bool:
    return hmac.compare_digest(sign_payload(secret, payload), signature)
