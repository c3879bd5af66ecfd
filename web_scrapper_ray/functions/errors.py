"""Exception hierarchy + logging setup (reference utility surface:
`/root/reference/src/webscraper/utils/exceptions.py` and
`utils/logging.py:16-150`).

The engine mostly lets Ray task retries and the `(None, status)` fetch
contract carry failure semantics, so these classes are the *user-facing
API parity* layer: code written against the reference's exception names
(`except ScraperError:` etc.) keeps working, and `configure_logging`
gives the same console/file/rotation setup knobs. ``ConfigError`` is
re-exported from config.py (the one exception the engine itself raises
at the same place the reference does — config validation).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from datetime import datetime
from typing import Optional

# Both defined in config.py (ConfigError must subclass the root, and
# this module imports from config — re-exporting avoids the cycle)
from ..config import ConfigError, WebScraperError  # noqa: F401


class ScraperError(WebScraperError):
    """Errors during fetch/extract operations (what the reference raises
    after its retry budget — the engine's fetch path instead records a
    ``failed`` outcome, but user extract hooks may raise this)."""


class StorageError(WebScraperError):
    """Errors during source/sink operations."""


class ValidationError(WebScraperError):
    """Errors during data validation."""


class ConnectionError(WebScraperError):  # noqa: A001 - reference name
    """Network connection errors."""


class RateLimitError(WebScraperError):
    """Rate limit exceeded (politeness board refusal in production)."""


class ParsingError(WebScraperError):
    """Errors during HTML/data parsing."""


class CaptchaError(WebScraperError):
    """Captcha encountered."""


class ProxyError(WebScraperError):
    """Proxy server errors."""


class AuthenticationError(WebScraperError):
    """Authentication errors."""


class SchedulingError(WebScraperError):
    """Errors during job scheduling."""


class DataProcessingError(WebScraperError):
    """Errors during data processing."""


DEFAULT_LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def configure_logging(level: str = "INFO",
                      log_file: Optional[str] = None,
                      log_format: Optional[str] = None,
                      log_to_console: bool = True,
                      log_to_file: bool = False,
                      rotate_logs: bool = False,
                      max_log_size: int = 10 * 1024 * 1024,
                      backup_count: int = 5,
                      logger_name: Optional[str] = None) -> logging.Logger:
    """Reference `configure_logging` semantics (utils/logging.py:16-103):
    console/file handlers, optional rotation, timestamped default file
    under ~/.webscraper/logs, ValueError on a bad level name."""
    if log_to_file and not log_file:
        logs_dir = os.path.join(os.path.expanduser("~"), ".webscraper", "logs")
        os.makedirs(logs_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        log_file = os.path.join(logs_dir, f"webscraper_{stamp}.log")
    formatter = logging.Formatter(log_format or DEFAULT_LOG_FORMAT)
    logger = logging.getLogger(logger_name)
    numeric = getattr(logging, level.upper(), None)
    if not isinstance(numeric, int):
        raise ValueError(f"Invalid log level: {level}")
    logger.setLevel(numeric)
    logger.handlers = []
    if log_to_console:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(formatter)
        logger.addHandler(h)
    if log_to_file and log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        if rotate_logs:
            fh: logging.Handler = logging.handlers.RotatingFileHandler(
                log_file, maxBytes=max_log_size, backupCount=backup_count)
        else:
            fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    if logger_name:
        logger.propagate = False
    return logger


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
