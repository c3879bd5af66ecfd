"""Validation function library (reference semantics:
`/root/reference/src/webscraper/utils/validators.py:16-376`).

Scalar functions with exact parity plus numpy-vectorized batch variants
for ``map_batches`` stages.
"""

from __future__ import annotations

import json as _json
import re
from datetime import datetime
from typing import Optional, Union
from urllib.parse import urlparse

import numpy as np

_EMAIL_RX = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
# Blocklisted example domains (validators.py:37-47).
_EMAIL_BLOCK_RX = re.compile(
    r"@(example|test|sample|invalid)\.com$", re.IGNORECASE
)
_NON_DIGIT_RX = re.compile(r"[^\d+]")
_FAKE_PHONE_RXES = [
    re.compile(r"^0{7,}$"),
    re.compile(r"^1{7,}$"),
    re.compile(r"^(.)\1{6,}$"),
    re.compile(r"^12345\d*$"),
]
_DOMAIN_RX = re.compile(
    r"^[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?"
    r"(\.[a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?)*$"
)
_IPV4ISH_RX = re.compile(r"^\d+\.\d+\.\d+\.\d+$")

_COUNTRY_CODES = {
    "US": ["+1", "1"], "UK": ["+44", "44"], "CA": ["+1", "1"],
    "AU": ["+61", "61"], "IN": ["+91", "91"], "DE": ["+49", "49"],
    "FR": ["+33", "33"], "JP": ["+81", "81"], "BR": ["+55", "55"],
    "RU": ["+7", "7"],
}

DATE_FORMATS = [
    "%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%d/%m/%Y", "%m-%d-%Y",
    "%d-%m-%Y", "%b %d, %Y", "%d %b %Y", "%B %d, %Y", "%d %B %Y",
]


def is_valid_email(email) -> bool:
    if not email or not isinstance(email, str):
        return False
    if not _EMAIL_RX.match(email):
        return False
    return not _EMAIL_BLOCK_RX.search(email)


def is_valid_phone(phone, country_code: Optional[str] = None,
                   min_length: int = 7, max_length: int = 15) -> bool:
    if not phone or not isinstance(phone, str):
        return False
    digits = _NON_DIGIT_RX.sub("", phone)
    if len(digits) < min_length or len(digits) > max_length:
        return False
    if digits.startswith("+") and len(digits) < 8:
        return False
    if country_code and country_code in _COUNTRY_CODES:
        codes = _COUNTRY_CODES[country_code]
        if digits.startswith("+"):
            if not any(digits.startswith(c) for c in codes if c.startswith("+")):
                return False
        else:
            if not any(digits.startswith(c) for c in codes if not c.startswith("+")):
                if len(digits) < min_length:
                    return False
    return not any(rx.match(digits) for rx in _FAKE_PHONE_RXES)


def is_valid_url(url) -> bool:
    if not url or not isinstance(url, str):
        return False
    try:
        parsed = urlparse(url)
        if not parsed.scheme or not parsed.netloc:
            return False
        if parsed.scheme not in ("http", "https", "ftp"):
            return False
        domain = parsed.netloc
        if not _DOMAIN_RX.match(domain):
            return False
        if domain == "localhost" or _IPV4ISH_RX.match(domain):
            return False
        return len(domain.split(".")[-1]) >= 2
    except Exception:
        return False


def is_valid_date(date_str, formats: Optional[list] = None) -> bool:
    if not date_str or not isinstance(date_str, str):
        return False
    for fmt in formats or DATE_FORMATS:
        try:
            datetime.strptime(date_str, fmt)
            return True
        except ValueError:
            continue
    return False


def is_valid_ip(ip) -> bool:
    if not ip or not isinstance(ip, str):
        return False
    m = re.match(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$", ip)
    if m:
        return all(int(o) <= 255 for o in m.groups())
    return bool(re.match(r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$", ip))


def is_valid_credit_card(card_number) -> bool:
    """Luhn check (validators.py:247-279)."""
    if not card_number or not isinstance(card_number, str):
        return False
    digits = re.sub(r"[^\d]", "", card_number)
    if len(digits) < 13 or len(digits) > 19:
        return False
    total = 0
    for i, ch in enumerate(digits[::-1]):
        n = int(ch)
        if i % 2 == 1:
            n *= 2
            if n > 9:
                n -= 9
        total += n
    return total % 10 == 0


def is_valid_text(text, min_length: int = 1, max_length: Optional[int] = None,
                  pattern: Optional[str] = None) -> bool:
    if not isinstance(text, str):
        return False
    if len(text) < min_length:
        return False
    if max_length is not None and len(text) > max_length:
        return False
    return not (pattern and not re.match(pattern, text))


def is_valid_json(json_str) -> bool:
    """json.loads acceptance, like the reference (validators.py:317-334)
    — NOTE this accepts NaN/Infinity literals that RFC-strict checkers
    (e.g. DuckDB json_valid) reject; the q17 oracle is therefore an
    approximation off-corpus. RecursionError (pathologically nested
    input) counts as invalid rather than killing the task."""
    if not json_str or not isinstance(json_str, str):
        return False
    try:
        _json.loads(json_str)
        return True
    except (ValueError, RecursionError):
        return False


def is_valid_numeric(value: Union[str, int, float],
                     min_value=None, max_value=None) -> bool:
    if isinstance(value, str):
        try:
            value = float(value) if "." in value else int(value)
        except ValueError:
            return False
    if not isinstance(value, (int, float)):
        return False
    if min_value is not None and value < min_value:
        return False
    return not (max_value is not None and value > max_value)


# ---------------------------------------------------------------------------
# Batch variants
# ---------------------------------------------------------------------------


def _bool_batch(fn, values) -> np.ndarray:
    return np.fromiter((fn(v) for v in values), dtype=bool, count=len(values))


def is_valid_email_batch(values) -> np.ndarray:
    return _bool_batch(is_valid_email, values)


def is_valid_phone_batch(values, country_code: Optional[str] = None) -> np.ndarray:
    return np.fromiter(
        (is_valid_phone(v, country_code) for v in values), dtype=bool, count=len(values)
    )


def is_valid_url_batch(values) -> np.ndarray:
    return _bool_batch(is_valid_url, values)


def is_valid_json_batch(values) -> np.ndarray:
    return _bool_batch(is_valid_json, values)
